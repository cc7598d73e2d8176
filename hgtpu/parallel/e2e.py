"""Connected end-to-end multi-chip typing: one jitted shard_map program.

The reference's typing data flow (typing_core.py:249-1789) is
    align -> per-read variant haplotype -> allele compatibility counts
    -> EM abundance
with reads streamed through SAM text between stages.  Here the same flow
is ONE device program over a `jax.sharding.Mesh`: reads are sharded over
the "dp" axis, every reference table (backbone PWM, SNP lookup, indel
catalog, link bitsets) is replicated, and the only cross-chip traffic is
`psum` of per-allele evidence over ICI — once for the totals and three
times per SQUAREM iteration (the M-step numerators), exactly the
collective structure the reference approximates with multiprocessing +
file merges (hisatgenotype:613-665).

Stages, all inside a single shard_map region so XLA can fuse and overlap:

1. placement    — MXU correlation against the variant-aware PWM for both
                  orientations (ops/placement.py); best diagonal per read.
2. extraction   — hypothesis-select the read's spelling against the
                  catalog:
                    * the straight diagonal (matches + known SNPs +
                      novel point edits — the MD+Zs information,
                      typing_core.py:899-1124), and
                    * for each of the MAX_INDEL_CAND catalog indels near
                      the placed span, a split-diagonal hypothesis: the
                      read follows diagonal s up to the indel, then
                      diagonal s+len (deletion) or s-len with the
                      inserted bases spelled in between (insertion) —
                      both prefix- and suffix-anchored, since the argmax
                      diagonal is whichever side of the indel is longer.
                  The winner (max matched bases; straight diagonal on
                  ties) yields the read's variant list, exactly the
                  haplotype the host engine derives from the aligner's
                  edit script (typer/engine.py read_hts).
3. verify gate  — reads whose novel-edit count exceeds the edit budget
                  or whose score falls below the placement floor are
                  zero-weighted (the NM <= num_editdist filter,
                  typing_core.py:966-973).  Reads the device cannot
                  spell are flagged in the returned punt mask so the
                  host engine (the bit-exact reference path) can rescue
                  them — reads crossing two or more indels are the only
                  in-gene class left behind.
4. pairing      — in paired mode, mate concordance (opposite
                  orientation, fragment span <= 1000 — the hisat2
                  -X 1000 / flag 0x2 check, typing_core.py:826-852) and
                  the per-pair compatibility-count argmax class of
                  add_stat (typing_core.py:1171-1236): count vector =
                  sum of both mates' per-allele compatibility, class =
                  alleles at the max count.
5. counting     — per-read haplotype -> allele compatibility bitsets via
                  the link matrix (typer/device_count.py, the add_count
                  set algebra of typing_core.py:626-677); psum of
                  per-allele class totals over the mesh.
6. EM           — data-parallel SQUAREM (Varadhan & Roland 2008, as the
                  reference's single_abundance, typing_common.py:
                  1282-1410): E-step on the local read shard (an
                  [n_local, A] matmul on the MXU), M-step numerators
                  psum-reduced, convergence at L1 diff < 1e-4 with a
                  1000-iteration cap; abundances replicated.

The same compiled program runs on 1 chip, an 8-device host, or a
multi-host slice.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..db.catalog import GeneRef, VT_DELETION, VT_INSERTION, VT_SINGLE
from ..ops.placement import backbone_pwm, correlate_scores, encode_reads
from ..typer.device_count import DeviceCounter, _compat
from .sharded import shard_map

MAX_SNP_ALTS = 3    # catalog alts per backbone position (A/C/G/T minus ref)
MAX_INDEL_CAND = 4  # catalog indels probed per read (2 anchors each)
MAX_INS_LEN = 16    # longest insertion spellable on-device
MAX_FRAG = 1000     # hisat2 -X 1000 concordance bound


def _snp_tables(gene: GeneRef, length: int):
    """Per-position catalog SNP lookup: snp_alt [L, MAX_SNP_ALTS] int8
    (7 = no entry) and snp_var [L, MAX_SNP_ALTS] int32 (sentinel =
    n_vars).  One gather per read base answers "is this mismatch a known
    variant, and which" — the device form of the Zs tag."""
    alt = np.full((length, MAX_SNP_ALTS), 7, np.int8)
    var = np.full((length, MAX_SNP_ALTS), gene.n_vars, np.int32)
    fill = np.zeros(length, np.int8)
    for vi in np.flatnonzero(gene.var_type == VT_SINGLE):
        p = int(gene.var_pos[vi])
        k = int(fill[p])
        if k < MAX_SNP_ALTS:
            alt[p, k] = "ACGT".index(gene.var_data[vi])
            var[p, k] = vi
            fill[p] = k + 1
    return alt, var


def _indel_tables(gene: GeneRef):
    """Sorted catalog indel table + a sentinel row (index D): position
    (2^30 — never in any read window), length 0, var id = n_vars (the
    all-ones padding row of the link bitsets)."""
    idx = np.flatnonzero((gene.var_type == VT_DELETION)
                         | (gene.var_type == VT_INSERTION))
    D = len(idx)
    pos = np.full(D + 1, 1 << 30, np.int32)
    ln = np.zeros(D + 1, np.int32)
    is_ins = np.zeros(D + 1, np.int8)
    ivar = np.full(D + 1, gene.n_vars, np.int32)
    ins_enc = np.full((D + 1, MAX_INS_LEN), 7, np.int8)
    for k, vi in enumerate(idx):
        pos[k] = gene.var_pos[vi]
        ivar[k] = vi
        if gene.var_type[vi] == VT_INSERTION:
            is_ins[k] = 1
            seq = gene.var_data[vi]
            if len(seq) <= MAX_INS_LEN:
                ln[k] = len(seq)
                for j, b in enumerate(seq):
                    ins_enc[k, j] = "ACGT".index(b)
            # longer insertions stay length 0: the hypothesis degenerates
            # to the straight diagonal and the read punts to the host
        else:
            ln[k] = gene.var_len[vi]
    order = np.argsort(pos[:D], kind="stable")
    for arr in (pos, ln, is_ins, ivar):
        arr[:D] = arr[order]
    ins_enc[:D] = ins_enc[order]
    return pos, ln, is_ins, ivar, ins_enc


class ShardedTyper:
    """One gene's typing pipeline compiled over a device mesh.

    Reads are data-parallel over `axis`.  Single-end: call the object
    with an [N, read_len] int8 code batch (pad code 4); returns
    (prob [A], totals [A], n_used, punt [N]) with prob/totals identical
    on every chip (psum-merged).  Paired: `call_pairs(r1, r2)` with two
    [Npair, read_len] mate batches."""

    def __init__(self, gene: GeneRef, mesh: Mesh, read_len: int = 100,
                 max_novel: int = 2, em_iters: int = 1000,
                 min_score_frac: float = 0.9, axis: str = "dp",
                 max_ht_vars: int = 16, family: str = "hla",
                 max_indel_cand: int = MAX_INDEL_CAND):
        self.gene = gene
        self.mesh = mesh
        self.read_len = read_len
        self.axis = axis
        self.family = family
        self.n_devices = int(np.prod(mesh.devices.shape))
        ipos_np, ilen_np, _, _, _ = _indel_tables(gene)
        max_shift = int(ilen_np.max()) if len(ilen_np) else 0
        pad = read_len + max_shift
        pwm = backbone_pwm(gene)
        pwm_ext = np.concatenate(
            [pwm, np.zeros((read_len, 5), np.float32)])
        bb_ext = np.concatenate(
            [gene.backbone_enc, np.full(pad, 4, np.int8)]).astype(np.int8)
        snp_alt, snp_var = _snp_tables(gene, len(bb_ext))
        ind_pos, ind_len, ind_ins, ind_var, ins_enc = _indel_tables(gene)
        dc = DeviceCounter(gene)
        self._tables = tuple(
            jnp.asarray(t) for t in (
                pwm_ext, bb_ext, snp_alt, snp_var,
                ind_pos, ind_len, ind_ins, ind_var, ins_enc,
                dc.links_packed, dc.nd_pos, dc.nd_prefix, dc.del_pos,
                dc.del_right, dc.del_links, dc.var_pos_d, dc.var_right_d))
        n_tables = len(self._tables)

        sentinel = gene.n_vars
        A = gene.n_alleles
        self.A = A
        D = len(ind_pos) - 1
        lens = gene.allele_lengths()
        inv_len_d = jnp.asarray(np.array(
            [1.0 / lens[a] for a in gene.allele_names], np.float32))
        K = max_ht_vars

        # hierarchical exon staging state (typing_core.py:1679-1789):
        # representative alleles grouped by identical exonic variant
        # sets, exon intervals for on-device ht clipping
        staged = family == "hla" and bool(gene.exons) and A > 1
        self._staged = staged
        if staged:
            from ..typer.engine import get_rep_alleles
            exon_vars = gene.exonic_var_mask(gene.exons)
            rep_mask, rep_groups = get_rep_alleles(gene, exon_vars)
            staged = bool(rep_mask.any())
            self._staged = staged
            self._rep_mask = jnp.asarray(rep_mask)
            self._rep_groups = rep_groups
        n_exons = len(gene.exons)
        ex_l = jnp.asarray(np.array(
            [e[0] for e in gene.exons] or [0], np.int32))
        ex_r = jnp.asarray(np.array(
            [e[1] for e in gene.exons] or [-1], np.int32))
        var_isdel_d = jnp.asarray(np.concatenate(
            [gene.var_type == VT_DELETION, [False]]))
        self._ones = jnp.ones(A, bool)

        def mate_pipeline(tabs, reads):
            """Stages 1-3 for one mate batch; returns per-read
            (class mask [n, A+pad], pass gate, orientation, span left,
            span right, needs_host)."""
            (pwm_ext, bb_ext, snp_alt, snp_var, ind_pos, ind_len,
             ind_ins, ind_var, ins_enc, links_packed, nd_pos, nd_prefix,
             del_pos, del_right, del_links, var_pos_d, var_right_d) = tabs
            n, W = reads.shape
            Lbb = bb_ext.shape[0]
            # -- 1. placement, both orientations ------------------------ #
            rc = jnp.where(reads[:, ::-1] < 4, 3 - reads[:, ::-1],
                           jnp.int8(4))
            s_f = correlate_scores(pwm_ext, reads)
            s_r = correlate_scores(pwm_ext, rc)
            best_f, arg_f = jnp.max(s_f, 1), jnp.argmax(s_f, 1)
            best_r, arg_r = jnp.max(s_r, 1), jnp.argmax(s_r, 1)
            use_r = best_r > best_f
            oriented = jnp.where(use_r[:, None], rc, reads)
            s0 = jnp.where(use_r, arg_r, arg_f).astype(jnp.int32)

            # -- 2. spelling hypotheses --------------------------------- #
            # candidates: the max_indel_cand catalog indels at/after
            # s0 - max_shift (window covers suffix-anchored frames)
            c0 = jnp.searchsorted(ind_pos[:D], s0 - max_shift)
            cand = jnp.minimum(c0[:, None]
                               + jnp.arange(max_indel_cand)[None, :], D)
            cand = jnp.where(ind_pos[cand] <= s0[:, None] + W + max_shift,
                             cand, D)                            # [n, C]
            # H hypotheses: straight + (prefix, suffix) anchor per cand
            hyp_c = jnp.concatenate(
                [jnp.full((n, 1), D, jnp.int32), cand, cand], 1)  # [n, H]
            dl = jnp.where(ind_ins[hyp_c] == 0, ind_len[hyp_c], 0)
            il = jnp.where(ind_ins[hyp_c] == 1, ind_len[hyp_c], 0)
            anchor_suffix = jnp.concatenate(
                [jnp.zeros((n, 1 + max_indel_cand), bool),
                 jnp.ones((n, max_indel_cand), bool)], 1)
            hyp_s = jnp.where(anchor_suffix, s0[:, None] - dl + il,
                              s0[:, None])                        # [n, H]
            pv = ind_pos[hyp_c]
            q = pv - hyp_s                                        # [n, H]

            jj = jnp.arange(W, dtype=jnp.int32)[None, None, :]
            q3, il3, dl3 = q[..., None], il[..., None], dl[..., None]
            after = jj >= q3
            in_ins = (il3 > 0) & after & (jj < q3 + il3)
            bbpos = (hyp_s[..., None] + jj
                     + jnp.where(after, dl3, 0)
                     - jnp.where(jj >= q3 + il3, il3, 0))       # [n, H, W]
            gp = jnp.clip(bbpos, 0, Lbb - 1)
            bb = bb_ext[gp]
            c = oriented[:, None, :]
            ins_b = ins_enc[hyp_c[..., None],
                            jnp.clip(jj - q3, 0, MAX_INS_LEN - 1)]
            exp = jnp.where(in_ins, ins_b, bb)
            valid = (c < 4) & ((exp < 4) | in_ins)
            match = valid & (c == exp)
            mism = valid & ~match & ~in_ins
            var_j = jnp.full(gp.shape, sentinel, jnp.int32)
            for k in range(MAX_SNP_ALTS):
                hit = mism & (snp_alt[gp, k] == c)
                var_j = jnp.where(hit, snp_var[gp, k], var_j)
            known = var_j < sentinel
            novel = valid & ~match & ~known
            score = jnp.sum(match | known, 2).astype(jnp.float32)  # [n, H]
            n_novel = jnp.sum(novel, 2, dtype=jnp.int32)
            n_valid = jnp.sum(valid, 2, dtype=jnp.int32)

            # hypothesis validity: real candidate, in-backbone start, and
            # the indel strictly inside the read (>=1 anchored base on
            # each side); insertions must fit MAX_INS_LEN (len 0 rows are
            # real-candidate duds -> invalid)
            rl = jnp.sum(oriented < 4, 1).astype(jnp.int32)[:, None]
            real = hyp_c < D
            ok_h = ((hyp_s >= 0) & (q >= 1) & (q + il <= rl - 1)
                    & (q <= rl - 1) & ((dl > 0) | (il > 0)))
            straight = jnp.concatenate(
                [jnp.ones((n, 1), bool),
                 jnp.zeros((n, 2 * max_indel_cand), bool)], 1)
            score = jnp.where(straight | (real & ok_h), score, -1.0)

            # top-2 hypotheses: the winner spells the read; an EQUAL-cost
            # runner-up is an alternative spelling whose class unions in
            # (the device form of the reference's equal-cost alt
            # haplotypes, typing_common.py:1663-1955 — add_stat's argmax
            # class over summed per-ht counts takes the union when the
            # two spellings conflict).  argmax/top_k break ties toward
            # the straight diagonal (index 0).
            top_v, top_i = jax.lax.top_k(score, 2)                # [n, 2]
            tie2 = (top_v[:, 1] == top_v[:, 0]) & (top_v[:, 1] >= 0.0)

            def take(a, w):
                if a.ndim == 3:
                    return jnp.take_along_axis(a, w[:, None, None], 1)[:, 0]
                return jnp.take_along_axis(a, w[:, None], 1)[:, 0]

            win = top_i[:, 0]
            score_w = take(score, win)
            n_novel_w = take(n_novel, win)
            n_valid_w = take(n_valid, win)

            def ht_of(w):
                """(lefts, rights, vars) of hypothesis column w [n]."""
                var_w = take(var_j, w)                            # [n, W]
                ivar_w = ind_var[take(hyp_c, w)]                  # [n]
                span = jnp.where(take(in_ins, w),
                                 take(jnp.broadcast_to(
                                     pv[..., None], gp.shape), w),
                                 take(bbpos, w))
                valid_w = take(valid, w)
                l = jnp.min(jnp.where(valid_w, span, 1 << 30), 1)
                r = jnp.max(jnp.where(valid_w, span, -1), 1)
                vars_ = jnp.sort(jnp.concatenate(
                    [var_w, ivar_w[:, None]], 1), 1)[:, :K]
                return l, r, vars_, ivar_w

            l1, r1, v1, iv1 = ht_of(win)
            l2, r2, v2, iv2 = ht_of(top_i[:, 1])

            def clip_ht(l, r, vars_, k):
                """Intersect an ht with its k-th overlapping exon window
                (get_exon_haplotypes, typer/exons.py; ref typing_core.py
                exon clipping).  Non-overlapping windows degenerate to
                the all-compatible uniform row, which shifts every
                allele's count equally and leaves the argmax class
                unchanged — so no masking is needed downstream."""
                first = jnp.searchsorted(ex_r, l)
                wi = jnp.minimum(first + k, max(n_exons - 1, 0))
                el, er = ex_l[wi], ex_r[wi]
                ok = (first + k < n_exons) & (el <= r) & (er >= l)
                lc = jnp.where(ok, jnp.maximum(l, el), 1 << 30)
                rc = jnp.where(ok, jnp.minimum(r, er), -1)
                vp = var_pos_d[vars_]
                vr = var_right_d[vars_]
                isd = var_isdel_d[vars_]
                keep = jnp.where(
                    isd,
                    (vp - 1 >= lc[:, None]) & (vr + 1 <= rc[:, None]),
                    (vp >= lc[:, None]) & (vp <= rc[:, None]))
                vc = jnp.where(ok[:, None] & keep, vars_, sentinel)
                return lc, rc, vc

            # -- 3. verify gate ------------------------------------------ #
            nv = n_valid_w.astype(jnp.float32)
            passed = ((n_novel_w <= max_novel) & (n_valid_w > 0)
                      & (score_w >= min_score_frac * nv))
            # residual novel edits next to a catalog indel the spelling
            # does not claim: the read may cross a second indel (the
            # host engine spells multi-indel chains; the device does
            # not) — punt it (typer/engine.py read_hts is the rescue)
            claimed = ((ind_var[cand] == iv1[:, None])
                       | (tie2[:, None] & (ind_var[cand] == iv2[:, None])))
            in_span = ((cand < D)
                       & (ind_pos[cand] >= l1[:, None] - max_shift)
                       & (ind_pos[cand] <= r1[:, None]))
            ambiguous = jnp.any(in_span & ~claimed, 1) & (n_novel_w > 0)
            needs_host = (~passed | ambiguous) & (n_valid_w > 0)
            passed = passed & ~ambiguous

            # -- 5. per-read compatibility masks (winner + tied alt, at
            # the full level plus up to 2 exon-clipped windows for the
            # hierarchical exon stage) -- #
            groups = [(l1, r1, v1), (l2, r2, v2)]
            if staged:
                for k in (0, 1):
                    groups.append(clip_ht(l1, r1, v1, k))
                    groups.append(clip_ht(l2, r2, v2, k))
            masks = _compat(links_packed, nd_pos, nd_prefix, del_pos,
                            del_right, del_links, var_pos_d, var_right_d,
                            jnp.concatenate([g[0] for g in groups]),
                            jnp.concatenate([g[1] for g in groups]),
                            jnp.concatenate([g[2] for g in groups]))
            m = [masks[i * n:(i + 1) * n].astype(jnp.int32)
                 for i in range(len(groups))]
            cnt = m[0] + m[1] * tie2[:, None]
            if staged:
                cnt_ex = (m[2] + m[3]
                          + (m[4] + m[5]) * tie2[:, None])
            else:
                cnt_ex = cnt
            return cnt, cnt_ex, passed, use_r, l1, r1, needs_host

        def finish(cnt, cnt_ex, w, punt):
            """Stage-5 epilogue: weighted full-level class totals.
            cnt/cnt_ex [n, A] int compatibility counts, w [n] f32."""
            w = w * (1.0 - punt.astype(jnp.float32))
            mx = jnp.max(cnt, 1)
            cls = ((cnt == mx[:, None])
                   & (w > 0)[:, None]).astype(jnp.float32)
            totals = jax.lax.psum(cls.T @ w, axis)
            n_used = jax.lax.psum(jnp.sum(w), axis)
            return cnt, cnt_ex, w, totals, n_used, punt

        def shard_single(*args):
            tabs, reads = args[:n_tables], args[n_tables]
            cnt, cnt_ex, passed, _, _, _, needs_host = \
                mate_pipeline(tabs, reads)
            p = passed[:, None]
            return finish(cnt * p, cnt_ex * p,
                          passed.astype(jnp.float32), needs_host)

        def shard_pairs(*args):
            tabs, r1, r2 = args[:n_tables], args[n_tables], \
                args[n_tables + 1]
            c1, ce1, ok1, o1, l1, rr1, nh1 = mate_pipeline(tabs, r1)
            c2, ce2, ok2, o2, l2, rr2, nh2 = mate_pipeline(tabs, r2)
            # -- 4. concordance (typing_core.py:826-852) ----------------- #
            span = (jnp.maximum(rr1, rr2) - jnp.minimum(l1, l2))
            conc = (o1 != o2) & (span <= MAX_FRAG)
            used = conc & (ok1 | ok2)
            cnt = c1 * ok1[:, None] + c2 * ok2[:, None]
            cnt_ex = ce1 * ok1[:, None] + ce2 * ok2[:, None]
            punt = conc & (nh1 | nh2)
            return finish(cnt, cnt_ex, used.astype(jnp.float32), punt)

        # -- 6. staged SQUAREM EM over the device-resident class shard -- #
        def em_shard(remove_low, use_len, cnt, w, include, restrict):
            """One EM level (the reference's single_abundance,
            typing_common.py:1282-1410): per-read class = argmax of the
            compatibility counts over `include`d alleles (add_stat,
            typing_core.py:1171-1236), intersected with the `restrict`
            set from the previous stage (the hierarchical staging of
            typing_core.py:1679-1789); SQUAREM with L1 diff < 1e-4,
            1000-iteration cap, optional low-abundance pruning and
            length normalization."""
            mxv = jnp.max(jnp.where(include[None, :], cnt, -1), 1)
            cls = ((cnt == mxv[:, None]) & include[None, :]
                   & restrict[None, :] & (w > 0)[:, None])
            M = cls.astype(jnp.float32)
            wl = w * cls.any(1)

            def norm(p):
                if use_len:
                    p = p * inv_len_d
                return p / jnp.maximum(p.sum(), 1e-30)

            def nxt(p):
                denom = M @ p
                qv = jnp.where(denom > 0, wl / jnp.maximum(denom, 1e-30),
                               0.0)
                return norm(jax.lax.psum(M.T @ qv, axis) * p)

            sizes = jnp.maximum(M.sum(1), 1.0)
            p0 = norm(jax.lax.psum(M.T @ (wl / sizes), axis))

            def body(state):
                p, _, it = state
                p1 = nxt(p)
                p2 = nxt(p1)
                r = p1 - p
                v = p2 - p1 - r
                ssv = jnp.sum(v * v)
                gamma = -jnp.sqrt(jnp.sum(r * r)
                                  / jnp.maximum(ssv, 1e-30))
                accel = jnp.maximum(
                    0.0, p - 2 * gamma * r + gamma * gamma * v)
                p_new = jnp.where(ssv > 0.0, nxt(accel), p1)
                diff = jnp.sum(jnp.abs(p_new - p))
                if remove_low:
                    p_new = jnp.where(
                        it >= 10,
                        jnp.where(p_new >= p_new.max() / 10.0, p_new, 0.0),
                        p_new)
                return p_new, diff, it + 1

            def cond(state):
                _, diff, it = state
                return (diff > 1e-4) & (it < em_iters)

            p, _, _ = jax.lax.while_loop(
                cond, body, (p0, jnp.float32(1.0), jnp.int32(0)))
            if remove_low:
                p = jnp.where(p >= p.max() / 10.0, p, 0.0)
            return norm(p)

        specs_t = tuple([P()] * n_tables)
        outs = (P(axis), P(axis), P(axis), P(), P(), P(axis))
        self._count_single = jax.jit(shard_map(
            shard_single, mesh, in_specs=specs_t + (P(axis),),
            out_specs=outs, check_rep=False))
        self._count_pairs = jax.jit(shard_map(
            shard_pairs, mesh, in_specs=specs_t + (P(axis), P(axis)),
            out_specs=outs, check_rep=False))
        self._em_steps = {
            key: jax.jit(shard_map(
                functools.partial(em_shard, *key), mesh,
                in_specs=(P(axis), P(axis), P(), P()), out_specs=P(),
                check_rep=False))
            for key in ((False, False), (True, False), (True, True))}

        def shard_debug(*args):
            tabs, reads = args[:n_tables], args[n_tables]
            cnt, _, passed, use_r, lefts, rights, needs_host = \
                mate_pipeline(tabs, reads)
            return (cnt, passed, use_r, lefts, rights, needs_host)

        self._debug = jax.jit(shard_map(
            shard_debug, mesh, in_specs=specs_t + (P(axis),),
            out_specs=(P(axis),) * 6, check_rep=False))

    # ------------------------------------------------------------------ #
    def encode(self, seqs):
        return encode_reads(seqs, self.read_len)

    def _pad(self, codes):
        n, d = codes.shape[0], self.n_devices
        if n % d:
            pad = np.full((d - n % d, codes.shape[1]), 4, np.int8)
            codes = np.concatenate([codes, pad])
        return codes

    # ------------------------------------------------------------------ #
    def _exon_winners(self, exon_prob: np.ndarray):
        """Expandable exon-stage winners: the shared staging policy
        (typer/staging.expansion_winners — same constants and selection
        rule as the host engine) over the device EM's abundance vector.
        Zero-probability alleles never appear in the host's ranked list
        (single_abundance emits positives only), so they are filtered
        before ranking here too."""
        from ..typer.staging import expansion_winners

        order = np.argsort(-exon_prob, kind="stable")
        ranked = [(int(i), float(exon_prob[i])) for i in order
                  if exon_prob[i] > 0.0]
        idx_set, prob_sum = expansion_winners(ranked, self._rep_groups)
        sel = np.zeros(self.A, bool)
        sel[sorted(idx_set)] = True
        return sel, prob_sum

    def _solve(self, counted):
        """Staged EM over the device-resident class counts (the host
        hierarchy of typer/engine.py:809-874): exon-level EM over rep
        alleles, expansion of winning groups, full-level EM restricted
        to the expanded set with length normalization."""
        cnt, cnt_ex, w, totals, n_used, punt = counted
        if not self._staged:
            prob = np.asarray(
                self._em_steps[(False, False)](cnt, w, self._ones,
                                               self._ones))
            return prob, totals, n_used, punt
        exon_prob = np.asarray(
            self._em_steps[(True, False)](cnt_ex, w, self._rep_mask,
                                          self._ones))
        sel, prob_sum = self._exon_winners(exon_prob)
        if sel.any():
            full = np.asarray(
                self._em_steps[(True, True)](cnt, w, self._ones,
                                             jnp.asarray(sel)))
            prob = np.where(sel, full * prob_sum, exon_prob)
        else:
            prob = exon_prob
        return prob, totals, n_used, punt

    def __call__(self, read_codes: np.ndarray):
        n = read_codes.shape[0]
        counted = self._count_single(
            *self._tables, jnp.asarray(self._pad(read_codes)))
        prob, totals, n_used, punt = self._solve(counted)
        return (np.asarray(prob), np.asarray(totals), float(n_used),
                np.asarray(punt)[:n])

    def call_pairs(self, r1_codes: np.ndarray, r2_codes: np.ndarray):
        n = r1_codes.shape[0]
        counted = self._count_pairs(
            *self._tables, jnp.asarray(self._pad(r1_codes)),
            jnp.asarray(self._pad(r2_codes)))
        prob, totals, n_used, punt = self._solve(counted)
        return (np.asarray(prob), np.asarray(totals), float(n_used),
                np.asarray(punt)[:n])

    def call_allele(self, read_codes: np.ndarray):
        prob, totals, n_used, _ = self(read_codes)
        top = int(np.argmax(prob))
        return self.gene.allele_names[top], float(prob[top]), totals, n_used
