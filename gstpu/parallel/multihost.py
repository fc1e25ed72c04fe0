"""Multi-host (multi-process) wiring: jax.distributed + global-array helpers.

The reference has no distributed layer at all (SURVEY §2.8); single-process
multi-chip training shipped in rounds 1-3 (gstpu/parallel/{mesh,sharded}.py,
ICI collectives only).  This module adds the DCN leg of the north star's
"1 chip -> 1 host -> >=2 hosts" scaling row:

- ``init_distributed`` wires ``jax.distributed.initialize`` from CLI flags or
  ``GSTPU_COORDINATOR`` / ``GSTPU_NUM_PROCESSES`` / ``GSTPU_PROCESS_ID`` env
  vars (the standard TPU-pod env vars work too — on a real pod slice
  ``jax.distributed.initialize()`` with no args auto-detects, which is why
  every argument here is optional).
- After initialization ``jax.devices()`` spans all processes, so the existing
  ``make_mesh`` / ``make_sharded_train_step`` work unchanged — the mesh's
  'model'/'data' axes simply stripe across hosts and XLA routes the
  collectives over DCN where they cross a host boundary.
- ``put_global`` replaces ``jax.device_put`` for placing host-built arrays
  onto a process-spanning sharding: each process contributes only its
  addressable shards (``jax.make_array_from_callback``), which is the
  supported multi-process path (plain device_put targets only addressable
  devices).

Proof harness (no pod needed): ``scripts/multihost_dryrun.py`` runs the full
sharded train step as 2 processes x 4 virtual CPU devices and asserts the
loss/grads match the single-process 8-device run bit-for-bit.
"""

from __future__ import annotations

import os


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> bool:
    """Initialize jax.distributed if multi-process config is present.

    Returns True iff running multi-process.  Resolution order: explicit
    arguments, then GSTPU_* env vars.  With neither, this is a no-op (single
    process) — call sites can wire it unconditionally.
    """
    import jax

    coordinator = coordinator or os.environ.get("GSTPU_COORDINATOR")
    if coordinator is None:
        return False
    num_processes = int(num_processes
                        or os.environ.get("GSTPU_NUM_PROCESSES", "1"))
    process_id = int(process_id
                     if process_id is not None
                     else os.environ.get("GSTPU_PROCESS_ID", "0"))
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def put_global(x, sharding):
    """Place a host-replicated array onto a (possibly process-spanning)
    sharding.

    Single-process: plain ``jax.device_put``.  Multi-process: every process
    holds the SAME full ``x`` (numpy or jnp) and contributes its addressable
    shards via ``jax.make_array_from_callback``.
    """
    import jax
    import numpy as np

    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding,
                                        lambda idx: x[idx])
