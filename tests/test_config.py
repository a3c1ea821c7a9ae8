"""Flag registry tests (reference semantics: python_util/basic/flags.py)."""
import logging

import pytest

from citlab_as_tpu.config.flags import Flags, update_params, _parse_dict_value


def test_basic_types():
    f = Flags()
    f.define_string("name", "default", "doc")
    f.define_integer("count", 3, "doc")
    f.define_float("ratio", 0.5, "doc")
    f.define_boolean("flag", False, "doc")
    f.parse_flags(["--name", "abc", "--count", "7", "--flag", "true"])
    assert f.name == "abc"
    assert f.count == 7
    assert f.ratio == 0.5
    assert f.flag is True


def test_list_and_choices():
    f = Flags()
    f.define_list("items", ["a"], "doc")
    f.define_choices("mode", ["separator", "heading"], "separator", str, "doc")
    f.parse_flags(["--items", "x", "y", "--mode", "heading"])
    assert f.items == ["x", "y"]
    assert f.mode == "heading"


def test_dict_flag_coercion():
    f = Flags()
    f.define_dict("graph_params", {"num_layers": 1}, "doc")
    f.parse_flags([
        "--graph_params", "num_layers=3", "lr=0.5", "use_bn=true",
        "hidden=[64,32]", "name=abc", "flags=[true,false]",
    ])
    gp = f.graph_params
    assert gp["num_layers"] == 3
    assert gp["lr"] == 0.5
    assert gp["use_bn"] is True
    assert gp["hidden"] == [64, 32]
    assert gp["name"] == "abc"
    assert gp["flags"] == [True, False]


def test_dict_value_parsing():
    assert _parse_dict_value("3") == 3
    assert _parse_dict_value("3.5") == 3.5
    assert _parse_dict_value("3.0") == 3  # int when exact
    assert _parse_dict_value("t") is True
    assert _parse_dict_value("F") is False
    assert _parse_dict_value("[1, 2 ,3]") == [1, 2, 3]
    assert _parse_dict_value("[]") == []
    assert _parse_dict_value("hello") == "hello"


def test_args_from_file(tmp_path):
    cfg = tmp_path / "config.txt"
    cfg.write_text("--name abc  # a comment\n--count = 9\n# full comment line\n")
    f = Flags()
    f.define_string("name", "d", "doc")
    f.define_integer("count", 0, "doc")
    f.parse_flags([f"@{cfg}"])
    assert f.name == "abc"
    assert f.count == 9


def test_unparsed_args_returned():
    f = Flags()
    f.define_string("known", "x", "doc")
    unparsed = f.parse_flags(["--known", "y", "--unknown", "z"])
    assert "--unknown" in unparsed


def test_set_and_has_key():
    f = Flags()
    f.define_string("a", "1", "doc")
    f.parse_flags([])
    f.b = 42
    assert f.b == 42
    assert f.has_key("a") and f.hasKey("b")


def test_update_params_warns_on_unknown(caplog):
    defaults = {"alpha": 1, "beta": 2}
    with caplog.at_level(logging.CRITICAL):
        out = update_params(dict(defaults), {"alpha": 5, "gamma": 9}, name="test")
    assert out["alpha"] == 5
    assert out["gamma"] == 9  # merged anyway, as in the reference
    assert any("gamma" in rec.message for rec in caplog.records)


def test_parse_dict_flag():
    from citlab_as_tpu.config.flags import parse_dict_flag
    out = parse_dict_flag("confidence_threshold=0.6,min_neighbors_for_cluster=2,flag=true, s=x")
    assert out == {"confidence_threshold": 0.6,
                   "min_neighbors_for_cluster": 2,
                   "flag": True, "s": "x"}
    with pytest.raises(ValueError):
        parse_dict_flag("noequalsign")
