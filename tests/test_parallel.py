"""Multi-chip sharding tests on the 8-device virtual CPU mesh: sharded
results must equal the single-device path bit-for-bit."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hgtpu.db import build_gene_ref
from hgtpu.parallel.sharded import (device_tables, make_mesh, sharded_count,
                                    sharded_place)
from hgtpu.typer.device_count import DeviceCounter
from tests.synth import make_gene_msa


@pytest.fixture(scope="module")
def generef():
    spec = make_gene_msa(seed=11, n_alleles=32, length=1600)
    ref, _ = build_gene_ref("A", spec["names"], spec["rows"],
                            spec["ref_allele"], min_var_freq=0.0)
    return ref


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_sharded_place_matches_single(generef):
    from hgtpu.ops.placement import backbone_pwm, place_batch

    rng = np.random.default_rng(0)
    reads = rng.integers(0, 4, (64, 96)).astype(np.int8)
    pwm = backbone_pwm(generef)
    pwm_ext = np.concatenate([pwm, np.zeros((96, 5), np.float32)])
    s1, p1 = place_batch(jnp.asarray(pwm_ext), jnp.asarray(reads), top_k=4)
    mesh = make_mesh(8)
    step = sharded_place(mesh)
    s8, p8 = step(jnp.asarray(pwm_ext), jnp.asarray(reads))
    assert np.allclose(np.asarray(s1), np.asarray(s8))
    assert np.array_equal(np.asarray(p1), np.asarray(p8))


def test_sharded_count_matches_and_psums(generef):
    dc = DeviceCounter(generef)
    rng = np.random.default_rng(1)
    hts = []
    for _ in range(64):
        left = int(rng.integers(0, len(generef.backbone) - 120))
        right = left + 99
        vs = [int(v) for v in range(generef.n_vars)
              if left <= generef.var_pos[v] <= right][:3]
        hts.append((left, right, vs))
    lefts, rights, vars_ = dc.pack_hts(hts)
    single = dc.compat_masks(lefts, rights, vars_)

    mesh = make_mesh(8)
    step = sharded_count(mesh)
    C, A = 8, generef.n_alleles
    class_mask = rng.random((C, A)) < 0.2
    class_counts = rng.integers(1, 20, C).astype(np.float32)
    masks, totals, prob = step(*device_tables(dc),
                               jnp.asarray(lefts), jnp.asarray(rights),
                               jnp.asarray(vars_), jnp.asarray(class_mask),
                               jnp.asarray(class_counts))
    assert np.array_equal(np.asarray(masks)[:, :A], single)
    # psum-reduced totals equal the global per-allele sums
    assert np.array_equal(np.asarray(totals)[:A], single.sum(axis=0))
    assert abs(float(np.asarray(prob).sum()) - 1.0) < 1e-4


def test_sharded_verify_filter_matches_numpy():
    """Device lower-bound filter must equal the host formula on every
    mesh size (proposals sharded, table replicated)."""
    import jax.numpy as jnp

    from hgtpu.parallel.sharded import make_mesh, sharded_verify_filter

    rng = np.random.default_rng(23)
    R, W, PAD = 300, 24, 4
    tbl = rng.random((R + 2 * PAD + W, 6)) < 0.5
    tbl[:, 4:] = False
    for n_dev in (1, 2, 8):
        E = 8 * n_dev
        reads = rng.integers(0, 4, (E, W)).astype(np.int8)
        starts = rng.integers(0, R - 1, E).astype(np.int32)
        w_eff = rng.integers(0, W + 1, E).astype(np.int32)
        j = np.arange(W)
        ok = tbl[starts[:, None] + j[None, :] + PAD, reads]
        want = ((j[None, :] < w_eff[:, None]) & ~ok).sum(axis=1)
        mesh = make_mesh(n_dev)
        filt = sharded_verify_filter(mesh, lb_pad=PAD)
        got = np.asarray(filt(jnp.asarray(tbl), jnp.asarray(reads),
                              jnp.asarray(starts), jnp.asarray(w_eff)))
        assert (got == want).all(), n_dev


def test_sharded_banded_dp_matches_single():
    """The sharded banded DP must return the single-device costs on
    every mesh size."""
    import jax.numpy as jnp

    from hgtpu.db import build_gene_ref
    from hgtpu.ops.banded_dp import BandedDPTables
    from hgtpu.parallel.sharded import make_mesh, sharded_banded_dp
    from hgtpu.utils.dna import encode_seq
    from tests.synth import make_gene_msa

    spec = make_gene_msa(seed=11, n_alleles=16, length=1200)
    ref, _ = build_gene_ref("A", spec["names"], spec["rows"],
                            spec["ref_allele"], min_var_freq=0.0)
    tables = BandedDPTables(ref)
    rng = np.random.default_rng(5)
    E, W = 32, 80
    reads = np.full((E, W), 4, np.int8)
    lens = np.full(E, W, np.int32)
    starts = np.zeros(E, np.int32)
    for i in range(E):
        a = ref.allele_names[int(rng.integers(0, ref.n_alleles))]
        seq = ref.allele_seq(a)
        s = int(rng.integers(0, len(seq) - W - 4))
        r = list(seq[s:s + W])
        if rng.random() < 0.5:
            r[int(rng.integers(1, W - 1))] = "ACGT"[int(rng.integers(0, 4))]
        reads[i] = encode_seq("".join(r))
        starts[i] = s
    want_c, want_o = (np.asarray(x) for x in
                      tables.costs(reads, lens, starts))
    for n_dev in (2, 8):
        step = sharded_banded_dp(make_mesh(n_dev))(
            tables.P, tables.del_lens, tables.ins_lens)
        got_c, got_o = step(tables.arrays,
                            jnp.asarray(reads), jnp.asarray(lens),
                            jnp.asarray(starts))
        assert (np.asarray(got_c) == want_c).all(), n_dev
        assert (np.asarray(got_o) == want_o).all(), n_dev


# ---------------------------------------------------------------------- #
# Connected end-to-end sharded typing (hgtpu.parallel.e2e)
# ---------------------------------------------------------------------- #

def _snp_only_allele(ref, want_snps=True):
    """First allele carrying SNPs but no indels (device e2e path scope)."""
    from hgtpu.db.catalog import VT_SINGLE
    snp = ref.var_type == VT_SINGLE
    for i, name in enumerate(ref.allele_names):
        col = ref.links[:, i]
        if not col[~snp].any() and (col[snp].any() or not want_snps):
            return name
    raise AssertionError("no SNP-only allele in panel")


def _sim_codes(ref, alleles, typer, interval=2):
    from hgtpu.sim.simulator import simulate_reads
    r1, r2, _ = simulate_reads(ref, alleles, simulate_interval=interval,
                               read_len=100, frag_len=250, seed=5)
    return typer.encode([r.seq for r in r1] + [r.seq for r in r2])


def test_sharded_e2e_genotype_truth():
    """The connected placement->extract->count->EM program must rank the
    true allele #1 at 100.00% on every mesh size, with identical results
    across meshes."""
    from hgtpu.parallel.e2e import ShardedTyper

    spec = make_gene_msa(seed=11, n_alleles=32, length=1600,
                         n_snp=70, n_del=0, n_ins=0)
    ref, _ = build_gene_ref("A", spec["names"], spec["rows"],
                            spec["ref_allele"], min_var_freq=0.0)
    truth = _snp_only_allele(ref)

    probs = {}
    for n_dev in (1, 2, 8):
        typer = ShardedTyper(ref, make_mesh(n_dev), em_iters=200)
        codes = _sim_codes(ref, [truth], typer)
        name, p_top, totals, n_used = typer.call_allele(codes)
        assert name == truth, (n_dev, name, truth)
        assert p_top > 0.9999, (n_dev, p_top)
        assert n_used > 0.9 * codes.shape[0]
        probs[n_dev] = typer(codes)[0]
    assert np.allclose(probs[1], probs[2], atol=1e-4)
    assert np.allclose(probs[1], probs[8], atol=1e-4)


def test_sharded_e2e_heterozygous_pair():
    """A 50/50 two-allele mixture resolves both alleles near 50%."""
    from hgtpu.db.catalog import VT_SINGLE
    from hgtpu.parallel.e2e import ShardedTyper

    spec = make_gene_msa(seed=13, n_alleles=32, length=1600,
                         n_snp=70, n_del=0, n_ins=0)
    ref, _ = build_gene_ref("A", spec["names"], spec["rows"],
                            spec["ref_allele"], min_var_freq=0.0)
    snp = ref.var_type == VT_SINGLE
    pair = [name for i, name in enumerate(ref.allele_names)
            if not ref.links[~snp, i].any()][:2]
    assert len(pair) == 2

    typer = ShardedTyper(ref, make_mesh(8), em_iters=400)
    codes = _sim_codes(ref, pair, typer)
    prob, totals, n_used, _punt = typer(codes)
    top2 = np.argsort(prob)[::-1][:2]
    called = {ref.allele_names[i] for i in top2}
    assert called == set(pair), called
    assert prob[top2[0]] < 0.62 and prob[top2[1]] > 0.38


def _indel_allele(ref):
    """First allele carrying BOTH a catalog deletion and an insertion."""
    from hgtpu.db.catalog import VT_DELETION, VT_INSERTION
    d = ref.var_type == VT_DELETION
    i = ref.var_type == VT_INSERTION
    for a, name in enumerate(ref.allele_names):
        if ref.links[d, a].any() and ref.links[i, a].any():
            return name
    raise AssertionError("no indel-bearing allele in panel")


@pytest.fixture(scope="module")
def indel_ref():
    # min_var_freq above the rare-carrier fraction keeps insertion
    # columns out of the consensus, so they surface as catalog
    # insertion variants (as in the IMGT build, typing_process.py:68-154)
    spec = make_gene_msa(seed=3, n_alleles=40)
    ref, _ = build_gene_ref("A", spec["names"], spec["rows"],
                            spec["ref_allele"], min_var_freq=8.0)
    return ref


def test_sharded_e2e_indel_allele(indel_ref):
    """An indel-carrying truth allele genotypes at 100% on every mesh
    size: the split-diagonal device spelling handles catalog deletions
    and insertions, and the per-pair argmax class unions mate evidence
    exactly as the host engine (reads starting at an indel boundary are
    rescued by their mate — the same mechanism that keeps the host at
    100%) (VERDICT r2 item 2)."""
    from hgtpu.parallel.e2e import ShardedTyper
    from hgtpu.sim.simulator import simulate_reads

    ref = indel_ref
    truth = _indel_allele(ref)
    r1, r2, _ = simulate_reads(ref, [truth], simulate_interval=2,
                               read_len=100, frag_len=250, seed=5)
    probs = {}
    for n_dev in (1, 2, 8):
        typer = ShardedTyper(ref, make_mesh(n_dev))
        c1 = typer.encode([r.seq for r in r1])
        c2 = typer.encode([r.seq for r in r2])
        prob, totals, n_used, punt = typer.call_pairs(c1, c2)
        top = int(np.argmax(prob))
        assert ref.allele_names[top] == truth, (n_dev, top, truth)
        assert prob[top] > 0.9999, (n_dev, prob[top])
        assert n_used > 0.8 * len(r1)
        probs[n_dev] = prob
    assert np.allclose(probs[1], probs[2], atol=1e-4)
    assert np.allclose(probs[1], probs[8], atol=1e-4)


def test_sharded_e2e_paired(indel_ref):
    """The paired device program (mate concordance + per-pair argmax
    class) genotypes an indel truth at 100%, and rejects pairs whose
    mates share an orientation (the flag-0x2 concordance analog)."""
    from hgtpu.parallel.e2e import ShardedTyper
    from hgtpu.sim.simulator import simulate_reads

    ref = indel_ref
    truth = _indel_allele(ref)
    typer = ShardedTyper(ref, make_mesh(8))
    r1, r2, _ = simulate_reads(ref, [truth], simulate_interval=2,
                               read_len=100, frag_len=250, seed=5)
    c1 = typer.encode([r.seq for r in r1])
    c2 = typer.encode([r.seq for r in r2])
    prob, totals, n_used, punt = typer.call_pairs(c1, c2)
    top = int(np.argmax(prob))
    assert ref.allele_names[top] == truth
    assert prob[top] > 0.9999
    assert n_used > 0.8 * len(r1)

    # same-orientation mates are discordant: nothing should count
    _, _, n_used_disc, _ = typer.call_pairs(c1, c1)
    assert n_used_disc == 0.0


def test_sharded_vs_host_differential(indel_ref):
    """Device-vs-host contract (VERDICT r2 item 3): on the same paired
    reads the sharded program's call and abundances must match the host
    engine (the bit-exact reference path), homozygous and heterozygous,
    and every punted pair must overlap a catalog indel region (the only
    read class the device hands back)."""
    from hgtpu.db.catalog import VT_SINGLE
    from hgtpu.parallel.e2e import ShardedTyper
    from hgtpu.pipeline import type_reads
    from hgtpu.sim.simulator import simulate_reads
    from hgtpu.typer.engine import TypingOptions

    ref = indel_ref
    truth_indel = _indel_allele(ref)
    snp = ref.var_type == VT_SINGLE
    truth_snp = next(n for i, n in enumerate(ref.allele_names)
                     if ref.links[snp, i].any() and n != truth_indel)
    typer = ShardedTyper(ref, make_mesh(8))

    for alleles in ([truth_indel], [truth_indel, truth_snp]):
        r1, r2, _ = simulate_reads(ref, alleles, simulate_interval=3,
                                   read_len=100, frag_len=250, seed=11)
        c1 = typer.encode([r.seq for r in r1])
        c2 = typer.encode([r.seq for r in r2])
        dev_prob, _tot, n_used, punt = typer.call_pairs(c1, c2)
        assert punt.sum() <= 0.05 * len(r1)

        def host_prob_of(keep):
            host = type_reads(
                ref, [(r.name, r.seq) for i, r in enumerate(r1) if keep[i]],
                [(r.name, r.seq) for i, r in enumerate(r2) if keep[i]],
                TypingOptions(simulation=True))
            out = np.zeros(ref.n_alleles)
            for a, p in host.prob:
                out[ref.allele_index(a)] = p
            return out

        # tight contract on the subclass the device claims: the host on
        # exactly the non-punted pairs
        host_prob = host_prob_of(~punt)
        k = len(alleles)
        host_top = set(np.argsort(-host_prob, kind="stable")[:k])
        dev_top = set(np.argsort(-dev_prob, kind="stable")[:k])
        assert dev_top == host_top, (alleles, dev_top, host_top)
        assert np.abs(dev_prob - host_prob).max() < 5e-3, alleles
        # loose sanity against the full-set host run (punted pairs are
        # the only difference)
        host_full = host_prob_of(np.ones(len(r1), bool))
        assert np.abs(dev_prob - host_full).max() < 0.05, alleles

        # punted pairs must overlap an indel region of a truth allele
        indel_spans = []
        for name in alleles:
            for v in ref.allele_var_indices(name):
                if ref.var_type[v] != VT_SINGLE:
                    indel_spans.append((int(ref.var_pos[v]),
                                        int(ref.var_right[v])))
        for pi in np.flatnonzero(punt):
            near = False
            for r in (r1[pi], r2[pi]):
                pos = int(r.name.split("_")[1]) - 1
                for lo, hi in indel_spans:
                    if pos - 8 <= hi and pos + 108 >= lo:
                        near = True
            assert near, (pi, r1[pi].name)
