"""Shared VMEM accounting for the Pallas kernels (SURVEY §2.1).

One budget constant and one measuring rule for every ``supported()`` gate:
byte counts are derived from the SAME builder functions the kernel dispatch
uses (via ``jax.eval_shape``), so the gate can never drift from the kernel's
actual allocation — a drifted hand-maintained formula silently flips
dispatch to the slow path or OOMs at Mosaic compile time (round-1 ADVICE).

The physical VMEM is ~16 MiB/core (pallas guide); the budget leaves headroom
for Mosaic spills, pipeline double-buffers and compiler temporaries.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

VMEM_BUDGET_BYTES = 10 * 1024 * 1024

# The per-STEP kernels (gibbs_pallas/nade_pallas) run inside scan bodies
# where Mosaic double-buffers their I/O; they claim only this fraction of
# the budget so the enclosing program keeps headroom. One definition here —
# two drifting copies would give the kernels different effective budgets.
PER_STEP_KERNEL_BUDGET_BYTES = (VMEM_BUDGET_BYTES * 4) // 5

# Budget for STANDALONE grid-streamed kernels whose gate accounts for
# Mosaic's pipeline double-buffering HONESTLY (2x every grid-blocked
# operand — see nade_ll_pallas._bwd_bytes). Because nothing is hidden,
# the headroom only needs to cover compiler temporaries/spills: 3 MiB of
# the 16 MiB physical VMEM. Gates that use the plain 10 MiB budget above
# charge single-buffered bytes and rely on its larger implicit margin.
STANDALONE_KERNEL_BUDGET_BYTES = 13 * 1024 * 1024


def _nbytes(shape, dtype) -> int:
    return math.prod(shape) * jnp.dtype(dtype).itemsize


def tree_bytes(tree) -> int:
    """Total bytes of a pytree of arrays / ShapeDtypeStructs."""
    return sum(_nbytes(leaf.shape, leaf.dtype)
               for leaf in jax.tree.leaves(tree))


def scratch_bytes(scratch_shapes) -> int:
    """Total bytes of a pltpu scratch_shapes list (pltpu.VMEM entries expose
    shape/dtype)."""
    return sum(_nbytes(s.shape, s.dtype) for s in scratch_shapes)


def eval_shape_bytes(fn, *args, **kwargs) -> int:
    """Bytes of fn's outputs without running it — ``fn`` is the kernel's own
    argument builder, so this is exactly what the dispatch will allocate."""
    return tree_bytes(jax.eval_shape(fn, *args, **kwargs))
