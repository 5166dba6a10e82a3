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


def _write_atomic(path: str, writer) -> None:
    """Write via tmp-then-rename so readers never see a partial file."""
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        writer(f)
    os.replace(tmp, path)


def save_checkpoint(
    path: str,
    config: Any,
    params: Any,
    opt_state: Optional[Any] = None,
    step: Optional[int] = None,
    backend: str = "flax",
    async_save: bool = False,
) -> None:
    """Arrays are committed BEFORE meta.json/config.pkl are (atomically)
    replaced, so a crash mid-save leaves the previous checkpoint's meta
    paired with either the previous or the new arrays — never new meta
    over stale arrays (ADVICE r1). Async orbax saves additionally carry
    the step INSIDE the saved item; loading prefers it over meta.json."""
    os.makedirs(path, exist_ok=True)
    meta = {"step": int(step) if step is not None else None, "backend": backend}

    def finalize():
        _write_atomic(os.path.join(path, "config.pkl"), lambda f: pickle.dump(config, f))
        _write_atomic(
            os.path.join(path, "meta.json"), lambda f: f.write(json.dumps(meta).encode())
        )

    if backend == "orbax":
        _save_orbax(path, params, opt_state, step, async_save, finalize)
        return
    params = jax.device_get(params)
    _write_atomic(
        os.path.join(path, "params.msgpack"), lambda f: f.write(serialization.to_bytes(params))
    )
    # Also persist the pytree structure so params can be restored without
    # re-initializing the model first.
    _write_atomic(
        os.path.join(path, "params_tree.pkl"),
        lambda f: pickle.dump(
            jax.tree.map(lambda x: (np.shape(x), str(np.asarray(x).dtype)), params), f
        ),
    )
    if opt_state is not None:
        _write_atomic(
            os.path.join(path, "opt_state.pkl"),
            lambda f: pickle.dump(jax.device_get(opt_state), f),
        )
    finalize()


def _save_orbax(
    path: str,
    params: Any,
    opt_state: Optional[Any],
    step: Optional[int],
    async_save: bool,
    finalize,
) -> None:
    import orbax.checkpoint as ocp

    item = {"params": params}
    if opt_state is not None:
        item["opt_state"] = opt_state
    if step is not None:
        # Ride the step inside the (atomically committed) orbax item so a
        # crash between array commit and meta.json cannot desynchronise
        # the reported step from the arrays.
        item["step"] = np.asarray(step, np.int64)
    # The optimizer state mixes namedtuples (optax) into the tree; pickle
    # its structure so a template-free restore can rebuild it exactly.
    skeleton = jax.tree.map(lambda x: (np.shape(x), str(np.result_type(x))), item)
    _write_atomic(
        os.path.join(path, "tree_skeleton.pkl"), lambda f: pickle.dump(skeleton, f)
    )

    target = os.path.abspath(os.path.join(path, _ORBAX_DIR))
    if async_save:
        ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
        ckptr.save(target, args=ocp.args.StandardSave(item), force=True)
        # meta/config are written only after the async arrays commit.
        _async_checkpointers.append((ckptr, finalize))
    else:
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(target, item, force=True)
        finalize()


def wait_for_async() -> None:
    """Block until every in-flight async orbax save has committed (and
    write the matching meta/config files once it has)."""
    while _async_checkpointers:
        ckptr, finalize = _async_checkpointers.pop()
        ckptr.wait_until_finished()
        ckptr.close()
        if finalize is not None:
            finalize()


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
    step = restored.get("step")
    return restored["params"], restored.get("opt_state"), (
        int(step) if step is not None else None
    )


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
        params, opt_state, item_step = _load_orbax(path, params_template, opt_state_template)
        # The in-item step is committed atomically with the arrays;
        # meta.json may lag it by one async save window.
        return config, params, opt_state, item_step if item_step is not None else step

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
