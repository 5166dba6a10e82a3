"""Per-program XLA compiler-option overrides.

Mosaic kernels raise their own per-kernel VMEM ceiling via
`pltpu.CompilerParams` (ops/pallas/message_passing.py), but plain XLA
programs are still subject to the TPU compiler's 16 MB scoped-VMEM
default, and one real program trips it: the ADKT-VGP train step's
fusion stack peaks at 19.07M around the median-heuristic sort
(.zoo/logs/ADKT-VGP.log — the v5e has 128 MB VMEM/core, so this is a
compiler default, not a hardware limit). The `XLA_FLAGS` env route is
unusable here: the LOCAL XLA:CPU flag parser aborts on TPU-only flags
before the remote compile ever sees them, so the override must travel
as per-compile compiler options (jax.jit(compiler_options=...), which
the remote compile server forwards).

Set `ADKF_SCOPED_VMEM_KIB` (e.g. 65536) to activate; unset keeps the
stock configuration (and the warm compile caches — compiler options are
part of the cache key).
"""

from __future__ import annotations

import os
from typing import Optional


def xla_compiler_options() -> Optional[dict]:
    kib = os.environ.get("ADKF_SCOPED_VMEM_KIB")
    if not kib:
        return None
    return {"xla_tpu_scoped_vmem_limit_kib": int(kib)}
