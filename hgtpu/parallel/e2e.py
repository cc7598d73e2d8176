"""Connected end-to-end multi-chip typing: one jitted shard_map program.

The reference's typing data flow (typing_core.py:249-1789) is
    align -> per-read variant haplotype -> allele compatibility counts
    -> EM abundance
with reads streamed through SAM text between stages.  Here the same flow
is ONE device program over a `jax.sharding.Mesh`: reads are sharded over
the "dp" axis, every reference table (backbone PWM, SNP lookup, link
bitsets) is replicated, and the only cross-chip traffic is `psum` of
per-allele evidence over ICI — once for the totals and once per EM
iteration (the M-step numerator), exactly the collective structure the
reference approximates with multiprocessing + file merges
(hisatgenotype:613-665).

Stages, all inside a single shard_map region so XLA can fuse and overlap:

1. placement    — MXU correlation against the variant-aware PWM for both
                  orientations (ops/placement.py); best diagonal per read.
2. extraction   — gather backbone + SNP tables at the placed diagonal;
                  classify each read base as match / known catalog SNP /
                  novel edit (the information carried by MD+Zs,
                  typing_core.py:899-1124, without SAM round-tripping).
3. verify gate  — reads whose novel-edit count exceeds the edit budget are
                  zero-weighted (the NM <= num_editdist filter,
                  typing_core.py:966-973).
4. counting     — per-read haplotype -> allele compatibility bitsets via
                  the link matrix (typer/device_count.py, the add_count
                  set algebra of typing_core.py:626-677); psum of
                  per-allele totals over the mesh.
5. EM           — data-parallel EM: E-step on the local read shard
                  (an [n_local, A] matmul on the MXU), M-step numerator
                  psum-reduced; abundances replicated
                  (single_abundance, typing_common.py:1282-1410).

The same compiled program runs on 1 chip, an 8-device host, or a
multi-host slice.  Scope: the device program resolves reads that place on
a single diagonal (matches + SNPs + novel point edits); reads crossing
indel junctions fall to the host engine (typer/engine.py), which remains
the bit-exact reference path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..db.catalog import GeneRef, VT_SINGLE
from ..ops.placement import backbone_pwm, correlate_scores, encode_reads
from ..typer.device_count import DeviceCounter, MAX_HT_VARS, _compat
from .sharded import shard_map

MAX_SNP_ALTS = 3  # catalog alts per backbone position (A/C/G/T minus ref)


def _snp_tables(gene: GeneRef, pad: int):
    """Per-position catalog SNP lookup: snp_alt [P+pad, MAX_SNP_ALTS] int8
    (7 = no entry) and snp_var [P+pad, MAX_SNP_ALTS] int32 (sentinel =
    n_vars).  One gather per read base answers "is this mismatch a known
    variant, and which" — the device form of the Zs tag."""
    L = len(gene.backbone) + pad
    alt = np.full((L, MAX_SNP_ALTS), 7, np.int8)
    var = np.full((L, MAX_SNP_ALTS), gene.n_vars, np.int32)
    fill = np.zeros(L, np.int8)
    for vi in np.flatnonzero(gene.var_type == VT_SINGLE):
        p = int(gene.var_pos[vi])
        k = int(fill[p])
        if k < MAX_SNP_ALTS:
            alt[p, k] = "ACGT".index(gene.var_data[vi])
            var[p, k] = vi
            fill[p] = k + 1
    return alt, var


class ShardedTyper:
    """One gene's typing pipeline compiled over a device mesh.

    reads are data-parallel over `axis`; calling the object with an
    [N, read_len] int8 code batch (pad code 4) returns
    (prob [A], totals [A], n_used) with prob/totals identical on every
    chip (psum-merged)."""

    def __init__(self, gene: GeneRef, mesh: Mesh, read_len: int = 100,
                 max_novel: int = 2, em_iters: int = 200,
                 min_score_frac: float = 0.9, axis: str = "dp"):
        self.gene = gene
        self.mesh = mesh
        self.read_len = read_len
        self.n_devices = int(np.prod(mesh.devices.shape))
        pad = read_len
        pwm = backbone_pwm(gene)
        pwm_ext = np.concatenate([pwm, np.zeros((pad, 5), np.float32)])
        bb_ext = np.concatenate(
            [gene.backbone_enc, np.full(pad, 4, np.int8)]).astype(np.int8)
        snp_alt, snp_var = _snp_tables(gene, pad)
        dc = DeviceCounter(gene)
        self._tables = tuple(
            jnp.asarray(t) for t in (
                pwm_ext, bb_ext, snp_alt, snp_var,
                dc.links_packed, dc.nd_pos, dc.nd_prefix, dc.del_pos,
                dc.del_right, dc.del_links, dc.var_pos_d, dc.var_right_d))
        n_tables = len(self._tables)

        sentinel = gene.n_vars
        A = gene.n_alleles

        def shard(*args):
            (pwm_ext, bb_ext, snp_alt, snp_var, links_packed, nd_pos,
             nd_prefix, del_pos, del_right, del_links, var_pos_d,
             var_right_d, reads) = args
            W = reads.shape[1]
            # -- 1. placement, both orientations ------------------------ #
            rc = jnp.where(reads[:, ::-1] < 4, 3 - reads[:, ::-1],
                           jnp.int8(4))
            s_f = correlate_scores(pwm_ext, reads)
            s_r = correlate_scores(pwm_ext, rc)
            best_f, arg_f = jnp.max(s_f, 1), jnp.argmax(s_f, 1)
            best_r, arg_r = jnp.max(s_r, 1), jnp.argmax(s_r, 1)
            use_r = s_r.max(1) > s_f.max(1)
            oriented = jnp.where(use_r[:, None], rc, reads)
            starts = jnp.where(use_r, arg_r, arg_f).astype(jnp.int32)
            best = jnp.where(use_r, best_r, best_f)

            # -- 2. variant extraction at the placed diagonal ----------- #
            j = jnp.arange(W, dtype=jnp.int32)
            p = starts[:, None] + j[None, :]
            bb = bb_ext[p]
            c = oriented
            valid = (c < 4) & (bb < 4)
            mism = valid & (c != bb)
            var_j = jnp.full(p.shape, sentinel, jnp.int32)
            for k in range(MAX_SNP_ALTS):
                hit = mism & (snp_alt[p, k] == c)
                var_j = jnp.where(hit, snp_var[p, k], var_j)
            novel = mism & (var_j == sentinel)
            n_novel = jnp.sum(novel, 1, dtype=jnp.int32)
            n_valid = jnp.sum(valid, 1, dtype=jnp.int32)

            # -- 3. verify gate ----------------------------------------- #
            score_ok = best >= min_score_frac * n_valid.astype(jnp.float32)
            w = ((n_novel <= max_novel) & (n_valid > 0)
                 & score_ok).astype(jnp.float32)

            # -- haplotype span + sorted known-var list ----------------- #
            lefts = starts + jnp.min(jnp.where(valid, j[None, :], W), 1)
            rights = starts + jnp.max(jnp.where(valid, j[None, :], -1), 1)
            vars_ = jnp.sort(var_j, axis=1)[:, :MAX_HT_VARS]

            # -- 4. compatibility + ICI-reduced totals ------------------ #
            masks = _compat(links_packed, nd_pos, nd_prefix, del_pos,
                            del_right, del_links, var_pos_d, var_right_d,
                            lefts, rights, vars_)
            Mf = masks.astype(jnp.float32) * w[:, None]
            totals = jax.lax.psum(jnp.sum(Mf, 0), axis)
            n_used = jax.lax.psum(jnp.sum(w), axis)

            # -- 5. data-parallel EM (psum per iteration) --------------- #
            p0 = totals / jnp.maximum(totals.sum(), 1e-30)

            def body(_, prob):
                denom = Mf @ prob                     # local E-step (MXU)
                q = jnp.where(denom > 0, w / jnp.maximum(denom, 1e-30), 0.0)
                num = jax.lax.psum(Mf.T @ q, axis) * prob
                return num / jnp.maximum(num.sum(), 1e-30)

            prob = jax.lax.fori_loop(0, em_iters, body, p0)
            return prob, totals, n_used

        specs_in = tuple([P()] * n_tables) + (P(axis),)
        self._step = jax.jit(shard_map(
            shard, mesh, in_specs=specs_in, out_specs=(P(), P(), P()),
            check_rep=False))

    # ------------------------------------------------------------------ #
    def encode(self, seqs):
        return encode_reads(seqs, self.read_len)

    def __call__(self, read_codes: np.ndarray):
        n = read_codes.shape[0]
        d = self.n_devices
        if n % d:
            pad = np.full((d - n % d, read_codes.shape[1]), 4, np.int8)
            read_codes = np.concatenate([read_codes, pad])
        prob, totals, n_used = self._step(*self._tables,
                                          jnp.asarray(read_codes))
        return (np.asarray(prob), np.asarray(totals), float(n_used))

    def call_allele(self, read_codes: np.ndarray):
        prob, totals, n_used = self(read_codes)
        top = int(np.argmax(prob))
        return self.gene.allele_names[top], float(prob[top]), totals, n_used
