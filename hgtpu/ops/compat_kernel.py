"""Pallas kernel: bitset AND-reduce for compatibility counting.

Computes incl[h] = AND_k links_packed[vars[h, k]] over uint32 lanes — the
inner bitwise reduction of the read->allele compatibility test
(hgtpu.typer.device_count).  The variant indices arrive via scalar
prefetch so each grid step gathers its link rows before the body runs;
bitwise ops run on the VPU (this is not expressible as a matmul).
Falls back to interpret mode off-TPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HT_TILE = 8


def _kernel(vars_ref, links_ref, out_ref):
    # vars_ref: [Hp, K] int32 (scalar-prefetched, full array)
    # links_ref: [V+1, W] uint32 (full table resident in VMEM)
    # out_ref:  [HT_TILE, W] uint32 (this grid step's tile)
    K = vars_ref.shape[1]
    base = pl.program_id(0) * _HT_TILE
    for h in range(_HT_TILE):
        acc = links_ref[vars_ref[base + h, 0], :]
        for k in range(1, K):
            acc = acc & links_ref[vars_ref[base + h, k], :]
        out_ref[h, :] = acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def and_reduce_pallas(links_packed, vars_, interpret=None):
    """links_packed: [V+1, W] uint32; vars_: [H, K] int32 -> [H, W]."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    H, K = vars_.shape
    W = links_packed.shape[1]
    pad = (-H) % _HT_TILE
    if pad:
        vars_ = jnp.concatenate(
            [vars_, jnp.full((pad, K), links_packed.shape[0] - 1,
                             vars_.dtype)], axis=0)
    Hp = vars_.shape[0]
    grid = (Hp // _HT_TILE,)
    out = pl.pallas_call(
        _kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((_HT_TILE, W), lambda i, vars_ref: (i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((Hp, W), jnp.uint32),
        interpret=interpret,
    )(vars_, links_packed)
    return out[:H]
