"""Self-describing checkpoints: config + params (+ optimizer state, step).

Same contract as the reference's torch.save({model_config,
model_state_dict, optimizer_state_dict?, epoch?}) and
build_from_model_file (adaptive_dkt_utils.py:221-327): a checkpoint
carries its own config so the architecture can be reconstructed from
the file alone.

Two array backends behind one API (the config is always pickled — it is
a frozen dataclass, not arrays):
  * "flax" (default): msgpack in a single file. Host-local, simple.
  * "orbax": orbax.checkpoint PyTree save. Understands sharded
    jax.Arrays (each host writes only its shards — the multi-host path)
    and optionally saves ASYNC so the train loop does not stall on IO
    (wait_for_async() / the context manager drain at exit).
Loading auto-detects the backend from the directory layout.
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Any, Optional, Tuple

import jax
import numpy as np
from flax import serialization

_ORBAX_DIR = "arrays_ocp"
_async_checkpointers: list = []


def save_checkpoint(
    path: str,
    config: Any,
    params: Any,
    opt_state: Optional[Any] = None,
    step: Optional[int] = None,
    backend: str = "flax",
    async_save: bool = False,
) -> None:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "config.pkl"), "wb") as f:
        pickle.dump(config, f)
    meta = {"step": int(step) if step is not None else None, "backend": backend}
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)
    if backend == "orbax":
        _save_orbax(path, params, opt_state, async_save)
        return
    params = jax.device_get(params)
    with open(os.path.join(path, "params.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(params))
    # Also persist the pytree structure so params can be restored without
    # re-initializing the model first.
    with open(os.path.join(path, "params_tree.pkl"), "wb") as f:
        pickle.dump(jax.tree.map(lambda x: (np.shape(x), str(np.asarray(x).dtype)), params), f)
    if opt_state is not None:
        with open(os.path.join(path, "opt_state.pkl"), "wb") as f:
            pickle.dump(jax.device_get(opt_state), f)


def _save_orbax(path: str, params: Any, opt_state: Optional[Any], async_save: bool) -> None:
    import orbax.checkpoint as ocp

    item = {"params": params}
    if opt_state is not None:
        item["opt_state"] = opt_state
    # The optimizer state mixes namedtuples (optax) into the tree; pickle
    # its structure so a template-free restore can rebuild it exactly.
    skeleton = jax.tree.map(lambda x: (np.shape(x), str(np.result_type(x))), item)
    with open(os.path.join(path, "tree_skeleton.pkl"), "wb") as f:
        pickle.dump(skeleton, f)

    target = os.path.abspath(os.path.join(path, _ORBAX_DIR))
    if async_save:
        ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
        ckptr.save(target, args=ocp.args.StandardSave(item), force=True)
        _async_checkpointers.append(ckptr)
    else:
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(target, item, force=True)


def wait_for_async() -> None:
    """Block until every in-flight async orbax save has committed."""
    while _async_checkpointers:
        ckptr = _async_checkpointers.pop()
        ckptr.wait_until_finished()
        ckptr.close()


def _skeleton_to_template(skeleton: Any) -> Any:
    return jax.tree.map(
        lambda sd: np.zeros(sd[0], dtype=sd[1]),
        skeleton,
        is_leaf=lambda x: isinstance(x, tuple) and len(x) == 2 and isinstance(x[1], str),
    )


def _load_orbax(path: str, params_template, opt_state_template):
    import orbax.checkpoint as ocp

    with open(os.path.join(path, "tree_skeleton.pkl"), "rb") as f:
        skeleton = pickle.load(f)
    template = _skeleton_to_template(skeleton)
    if params_template is not None:
        template["params"] = params_template
    if opt_state_template is not None and "opt_state" in template:
        template["opt_state"] = opt_state_template
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(os.path.join(os.path.abspath(path), _ORBAX_DIR), template)
    return restored["params"], restored.get("opt_state")


def load_checkpoint(
    path: str,
    params_template: Optional[Any] = None,
    opt_state_template: Optional[Any] = None,
) -> Tuple[Any, Any, Optional[Any], Optional[int]]:
    """Returns (config, params, opt_state, step). If params_template is
    given, arrays are restored into its pytree structure; otherwise the
    stored structure skeleton is used."""
    with open(os.path.join(path, "config.pkl"), "rb") as f:
        config = pickle.load(f)
    step = None
    meta_path = os.path.join(path, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            step = json.load(f).get("step")

    if os.path.isdir(os.path.join(path, _ORBAX_DIR)):
        params, opt_state = _load_orbax(path, params_template, opt_state_template)
        return config, params, opt_state, step

    if params_template is None:
        with open(os.path.join(path, "params_tree.pkl"), "rb") as f:
            skeleton = pickle.load(f)
        params_template = _skeleton_to_template(skeleton)
    with open(os.path.join(path, "params.msgpack"), "rb") as f:
        params = serialization.from_bytes(params_template, f.read())
    opt_state = None
    opt_path = os.path.join(path, "opt_state.pkl")
    if os.path.exists(opt_path):
        with open(opt_path, "rb") as f:
            opt_state = pickle.load(f)
    return config, params, opt_state, step
