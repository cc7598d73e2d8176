"""Multi-host scaffolding: `jax.distributed` init + DCN read-shard
distribution.

The reference scales across hosts by running independent processes over
manually-striped sample lists (`--job-range`, hisatgenotype_args.py:235)
and merging text output.  The TPU-native equivalent: every host joins one
`jax.distributed` job, loads only its contiguous shard of the global read
set (the DCN-side distribution — reads never cross hosts), contributes it
to a global array over the full-slice mesh, and the same shard_map typing
program (`parallel.e2e.ShardedTyper`) runs unchanged — per-allele
evidence and EM numerators ride ICI/DCN through the `psum`s already in
the program.

Validated structurally by tests/test_multihost.py: 2 processes x 4
virtual CPU devices call the same genotype as single-process, bit-equal.
"""
from __future__ import annotations

import os

import numpy as np


def init_distributed(coordinator_address=None, num_processes=None,
                     process_id=None):
    """Join (or start) the distributed job.  Arguments fall back to
    HGTPU_COORDINATOR / HGTPU_NUM_PROCESSES / HGTPU_PROCESS_ID, then to
    jax's own auto-detection (TPU pod metadata / cluster envs)."""
    import jax

    coordinator_address = coordinator_address or \
        os.environ.get("HGTPU_COORDINATOR")
    if num_processes is None and "HGTPU_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["HGTPU_NUM_PROCESSES"])
    if process_id is None and "HGTPU_PROCESS_ID" in os.environ:
        process_id = int(os.environ["HGTPU_PROCESS_ID"])
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return jax.process_index(), jax.process_count()


def global_mesh(axis: str = "dp"):
    """1-D mesh over every device of every process."""
    import jax
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), (axis,))


def process_read_shard(n_total: int, process_index=None,
                       process_count=None):
    """[start, stop) of this process's contiguous block of the global
    read set.  n_total must divide evenly (pad first — the typing weights
    zero out pad reads)."""
    import jax

    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    assert n_total % pc == 0, \
        "pad the global read count to a multiple of %d" % pc
    per = n_total // pc
    return pi * per, (pi + 1) * per


def pad_reads(codes: np.ndarray, multiple: int):
    """Pad read codes with all-N rows up to `multiple` (pad reads carry
    zero weight through the verify gate)."""
    n = codes.shape[0]
    extra = (-n) % multiple
    if extra:
        codes = np.concatenate(
            [codes, np.full((extra, codes.shape[1]), 4, np.int8)])
    return codes


def distributed_call(typer, local_codes: np.ndarray):
    """Run a `ShardedTyper` step with this process contributing only its
    local read shard; returns the replicated (prob, totals, n_used)
    identical on every process."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    axis = typer.mesh.axis_names[0]
    sharding = NamedSharding(typer.mesh, P(axis))
    global_codes = jax.make_array_from_process_local_data(
        sharding, np.ascontiguousarray(local_codes))
    counted = typer._count_single(*typer._tables, global_codes)
    prob, totals, n_used, _punt = typer._solve(counted)
    # the punt mask stays device-sharded (process-local reads only); the
    # replicated outputs are what every host agrees on
    return np.asarray(prob), np.asarray(totals), float(n_used)
