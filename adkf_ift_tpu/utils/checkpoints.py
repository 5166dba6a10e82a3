"""Self-describing checkpoints: config + params (+ optimizer state, step).

Same contract as the reference's torch.save({model_config,
model_state_dict, optimizer_state_dict?, epoch?}) and
build_from_model_file (adaptive_dkt_utils.py:221-327): a checkpoint
carries its own config so the architecture can be reconstructed from
the file alone. Serialization is flax msgpack for arrays + pickle for
the (frozen dataclass) config, in a single directory.
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Any, Optional, Tuple

import jax
import numpy as np
from flax import serialization


def save_checkpoint(
    path: str,
    config: Any,
    params: Any,
    opt_state: Optional[Any] = None,
    step: Optional[int] = None,
) -> None:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "config.pkl"), "wb") as f:
        pickle.dump(config, f)
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
    meta = {"step": int(step) if step is not None else None}
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)


def load_checkpoint(
    path: str,
    params_template: Optional[Any] = None,
) -> Tuple[Any, Any, Optional[Any], Optional[int]]:
    """Returns (config, params, opt_state, step). If params_template is
    given, arrays are restored into its pytree structure; otherwise the
    stored structure skeleton is used."""
    with open(os.path.join(path, "config.pkl"), "rb") as f:
        config = pickle.load(f)
    if params_template is None:
        with open(os.path.join(path, "params_tree.pkl"), "rb") as f:
            skeleton = pickle.load(f)
        params_template = jax.tree.map(
            lambda sd: np.zeros(sd[0], dtype=sd[1]), skeleton,
            is_leaf=lambda x: isinstance(x, tuple) and len(x) == 2 and isinstance(x[1], str),
        )
    with open(os.path.join(path, "params.msgpack"), "rb") as f:
        params = serialization.from_bytes(params_template, f.read())
    opt_state = None
    opt_path = os.path.join(path, "opt_state.pkl")
    if os.path.exists(opt_path):
        with open(opt_path, "rb") as f:
            opt_state = pickle.load(f)
    step = None
    meta_path = os.path.join(path, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            step = json.load(f).get("step")
    return config, params, opt_state, step
