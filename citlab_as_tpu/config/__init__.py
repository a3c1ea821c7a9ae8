from citlab_as_tpu.config.flags import (
    FLAGS, Flags, define_string, define_integer, define_float, define_boolean,
    define_list, define_choices, define_dict, update_params, print_flags,
    reset_flags,
)

__all__ = [
    "FLAGS", "Flags", "define_string", "define_integer", "define_float",
    "define_boolean", "define_list", "define_choices", "define_dict",
    "update_params", "print_flags", "reset_flags",
]
