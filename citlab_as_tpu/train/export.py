"""Frozen model export: one self-contained artifact for deployment.

Reference: model_base.py:391-504 exports a frozen TF1 ``.pb`` GraphDef
(including the cuDNN-opaque-kernel GPU->CPU double export) that inference
CLIs load without knowing the training configuration. TPU-native analog:
a single zip artifact holding the flax params (msgpack via
``flax.serialization``) plus a JSON header naming the architecture and its
constructor kwargs, so :func:`load_frozen` can rebuild the exact model with
no out-of-band information. There is no opaque-kernel dance here — JAX
params are plain arrays, and the same artifact serves CPU and TPU.
"""
from __future__ import annotations

import io
import json
import os
import zipfile
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

FROZEN_FORMAT_VERSION = 1

# registry of exportable architectures; values are import paths so the
# artifact stays loadable without importing every model family up front
_ARCHITECTURES = {
    "arunet": ("citlab_as_tpu.models.arunet", "ARUNet"),
    "graph_relation": ("citlab_as_tpu.models.gnn.model", "GraphRelation"),
    "inception_v3": ("citlab_as_tpu.models.inception_v3", "InceptionV3"),
}


def _resolve(architecture: str):
    if architecture not in _ARCHITECTURES:
        raise ValueError(
            f"Unknown architecture '{architecture}'; "
            f"known: {sorted(_ARCHITECTURES)}")
    module_name, cls_name = _ARCHITECTURES[architecture]
    import importlib
    return getattr(importlib.import_module(module_name), cls_name)


def _jsonable(value):
    """Constructor kwargs -> JSON-safe (dtypes become strings)."""
    if isinstance(value, dict):
        return {k: _jsonable(v) for k, v in value.items()}
    if isinstance(value, (list, tuple)):
        return [_jsonable(v) for v in value]
    if isinstance(value, (str, int, float, bool, type(None))):
        return value
    try:
        return str(np.dtype(value).name)  # jnp.bfloat16 etc.
    except TypeError:
        raise ValueError(f"model kwarg {value!r} is not JSON-serializable")


def export_frozen(out_path: str, architecture: str, variables,
                  model_kwargs: Optional[Dict[str, Any]] = None,
                  metadata: Optional[Dict[str, Any]] = None) -> str:
    """Write params + architecture config as one ``.frozen`` zip.

    ``variables`` is the full flax variables dict ({'params': ...}).
    Returns the written path.
    """
    from flax import serialization

    _resolve(architecture)  # validate early
    host_vars = jax.tree_util.tree_map(np.asarray, variables)
    config = {
        "format_version": FROZEN_FORMAT_VERSION,
        "architecture": architecture,
        "model_kwargs": _jsonable(model_kwargs or {}),
        "metadata": metadata or {},
    }
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("config.json", json.dumps(config, indent=1))
        zf.writestr("params.msgpack", serialization.to_bytes(host_vars))
    with open(out_path, "wb") as f:
        f.write(buf.getvalue())
    return out_path


def _coerce_dtype_kwargs(kwargs: Dict[str, Any]) -> Dict[str, Any]:
    import jax.numpy as jnp
    out = dict(kwargs)
    for key, value in out.items():
        if key == "dtype" and isinstance(value, str):
            out[key] = jnp.dtype(value)
    return out


def load_frozen(path: str) -> Tuple[Any, Any, Dict[str, Any]]:
    """Read a ``.frozen`` artifact -> (model, variables, metadata)."""
    from flax import serialization

    with zipfile.ZipFile(path) as zf:
        config = json.loads(zf.read("config.json"))
        raw = zf.read("params.msgpack")
    if config["format_version"] > FROZEN_FORMAT_VERSION:
        raise ValueError(
            f"frozen artifact version {config['format_version']} is newer "
            f"than supported ({FROZEN_FORMAT_VERSION})")
    cls = _resolve(config["architecture"])
    model = cls(**_coerce_dtype_kwargs(config["model_kwargs"]))
    variables = serialization.msgpack_restore(raw)
    return model, variables, config.get("metadata", {})


def export_checkpoint_frozen(ckpt_dir: str, out_path: str, architecture: str,
                             model_kwargs: Optional[Dict[str, Any]] = None,
                             metadata: Optional[Dict[str, Any]] = None) -> str:
    """Freeze the newest orbax checkpoint under ``ckpt_dir`` (or a
    best/<metric> export dir) into ``out_path``."""
    import orbax.checkpoint as ocp

    steps = [d for d in os.listdir(ckpt_dir) if d.isdigit()]
    target = (os.path.join(ckpt_dir, max(steps, key=int))
              if steps else ckpt_dir)
    # restore every leaf as plain numpy: device-agnostic, so checkpoints
    # written on TPU freeze fine on a CPU host (saved sharding metadata
    # would otherwise demand the original device)
    ckptr = ocp.Checkpointer(ocp.PyTreeCheckpointHandler())
    meta = ckptr.metadata(os.path.abspath(target))
    restore_args = jax.tree_util.tree_map(
        lambda m: ocp.RestoreArgs(restore_type=np.ndarray),
        meta.item_metadata.tree)
    restored = ckptr.restore(
        os.path.abspath(target),
        args=ocp.args.PyTreeRestore(restore_args=restore_args))
    # trainer checkpoints hold {'params': variables, 'opt_state': ...};
    # the training scripts save {'params': variables} without opt state;
    # best exports hold the variables dict directly
    variables = restored
    inner = restored.get("params")
    if "opt_state" in restored or (isinstance(inner, dict) and "params" in inner):
        variables = inner
    meta = dict(metadata or {})
    meta.setdefault("source_checkpoint", os.path.abspath(target))
    return export_frozen(out_path, architecture, variables, model_kwargs, meta)
