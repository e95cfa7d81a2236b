"""Multi-host (DCN) runtime seam.

The reference has no distributed backend at all (SURVEY.md §2.3). Within one
TPU slice the framework needs no explicit transport (XLA collectives over
ICI); across hosts JAX's DCN runtime is initialized here. Only needed when a
sweep spans multiple hosts — the 42-subject workload fits a single v5e-8
slice, so this is the documented expansion seam, not a hot path.
"""

from __future__ import annotations

import os
from typing import Optional


def init_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed when multi-host env vars / args are
    present. Returns True when running multi-host, False for single-host
    (the common case; no-op)."""
    coordinator_address = coordinator_address or os.environ.get("EAV_TPU_COORDINATOR")
    if coordinator_address is None:
        return False
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def global_mesh_axes():
    """Recommended axis layout once multi-host: subjects over DCN (zero
    inter-host traffic), data/model over ICI within a slice."""
    return (("subject", "dcn"), ("data", "ici"), ("model", "ici"))
