"""The banded device DP must return exactly the host DFS's minimum
novel-edit cost for every (read, start) proposal, or raise its overflow
flag (band/slot/chain limits)."""
import numpy as np
import pytest

from hgtpu.align.verify import GeneVerifier
from hgtpu.db import build_gene_ref
from hgtpu.ops.banded_dp import BandedDPTables, INF
from hgtpu.utils.dna import encode_seq
from tests.synth import make_gene_msa


@pytest.fixture(scope="module")
def generef():
    spec = make_gene_msa(seed=11, n_alleles=24, length=1600, n_del=10,
                         n_ins=8)
    ref, _ = build_gene_ref("A", spec["names"], spec["rows"],
                            spec["ref_allele"], min_var_freq=0.0)
    return ref


def _mutate(rng, seq):
    s = list(seq)
    for _ in range(int(rng.integers(0, 3))):
        k = int(rng.integers(0, 4))
        p = int(rng.integers(1, len(s) - 2))
        if k == 0:
            s[p] = "ACGT"[int(rng.integers(0, 4))]
        elif k == 1:
            del s[p]
        elif k == 2:
            s.insert(p, "ACGT"[int(rng.integers(0, 4))])
    return "".join(s)


def test_dp_cost_matches_dfs(generef):
    rng = np.random.default_rng(31)
    ver = GeneVerifier(generef, max_novel=2, haplotype_paths=False)
    tables = BandedDPTables(generef)
    # reads from real alleles (catalog variants), mutated, plus junk
    entries = []
    for _ in range(120):
        a = generef.allele_names[int(rng.integers(0, generef.n_alleles))]
        seq = generef.allele_seq(a)
        start = int(rng.integers(0, len(seq) - 110))
        read = seq[start:start + 100]
        read = _mutate(rng, read)
        # propose near the true backbone start (same, +-1, +-2)
        s = start + int(rng.integers(-2, 3))
        if 0 <= s < len(generef.backbone):
            entries.append((encode_seq(read), s))
    for i in range(30):
        n = int(rng.integers(40, 100))
        read = "".join("ACGT"[c] for c in rng.integers(0, 4, n))
        entries.append((encode_seq(read),
                        int(rng.integers(0, len(generef.backbone) - n))))
    W = max(len(r) for r, _ in entries)
    E = len(entries)
    reads = np.full((E, W), 4, np.int8)
    lens = np.zeros(E, np.int32)
    starts = np.zeros(E, np.int32)
    for i, (r, s) in enumerate(entries):
        reads[i, : len(r)] = r
        lens[i] = len(r)
        starts[i] = s
    cost, over = tables.costs(reads, lens, starts)
    cost = np.asarray(cost)
    over = np.asarray(over)
    n_checked = 0
    for i, (r, s) in enumerate(entries):
        if over[i]:
            continue
        res = ver.verify(r, s)
        dfs_cost = res[0] if res is not None else None
        dp = int(cost[i])
        if dfs_cost is None:
            assert dp > 2, (i, dp)   # DFS budget is 2
        else:
            assert dp == dfs_cost, (i, dp, dfs_cost, s)
        n_checked += 1
    # the band must be generous enough to cover most proposals
    assert n_checked >= E * 0.7, (n_checked, E)


def test_dp_overflow_on_wide_deletion():
    """A catalog deletion wider than the band must set overflow."""
    from hgtpu.db.catalog import GeneRef, VT_DELETION

    bb = "ACGT" * 60
    gene = GeneRef(
        gene="X", backbone_name="X*BB", backbone=bb,
        allele_names=["X*A", "X*B"],
        var_ids=["hv0"],
        var_type=np.array([VT_DELETION], np.int8),
        var_pos=np.array([60], np.int32),
        var_len=np.array([40], np.int32),   # > DPOS
        var_data=["40"],
        var_freq=np.array([50.0], np.float32),
        links=np.array([[False, True]]),
        exons=[(0, len(bb) - 1)], primary_exons=[(0, len(bb) - 1)],
        haplotypes=[],
    )
    tables = BandedDPTables(gene)
    read = encode_seq(bb[40:60] + bb[100:140])   # uses the wide deletion
    reads = read[None, :].astype(np.int8)
    cost, over = tables.costs(reads, np.array([len(read)], np.int32),
                              np.array([40], np.int32))
    assert bool(np.asarray(over)[0])


def test_dp_cost_matches_dfs_insertion_gene():
    """Same equivalence on a gene whose catalog includes insertions
    (min_var_freq > 0 is what admits them, NEXT.md divergence note)."""
    from hgtpu.db.catalog import VT_INSERTION

    spec = make_gene_msa(seed=15, n_alleles=24, length=1600, n_ins=14)
    ref, _ = build_gene_ref("A", spec["names"], spec["rows"],
                            spec["ref_allele"], min_var_freq=8.0)
    assert int((ref.var_type == VT_INSERTION).sum()) >= 1
    rng = np.random.default_rng(41)
    ver = GeneVerifier(ref, max_novel=2, haplotype_paths=False)
    tables = BandedDPTables(ref)
    ins_pos = [int(ref.var_pos[v]) for v in range(ref.n_vars)
               if int(ref.var_type[v]) == VT_INSERTION]
    entries = []
    for _ in range(80):
        a = ref.allele_names[int(rng.integers(0, ref.n_alleles))]
        seq = ref.allele_seq(a)
        # bias half the draws to windows spanning an insertion position
        if ins_pos and rng.random() < 0.5:
            start = max(0, min(len(seq) - 110,
                               ins_pos[0] - int(rng.integers(10, 80))))
        else:
            start = int(rng.integers(0, len(seq) - 110))
        read = _mutate(rng, seq[start:start + 100])
        s = start + int(rng.integers(-2, 3))
        if 0 <= s < len(ref.backbone):
            entries.append((encode_seq(read), s))
    W = max(len(r) for r, _ in entries)
    E = len(entries)
    reads = np.full((E, W), 4, np.int8)
    lens = np.zeros(E, np.int32)
    starts = np.zeros(E, np.int32)
    for i, (r, s) in enumerate(entries):
        reads[i, : len(r)] = r
        lens[i] = len(r)
        starts[i] = s
    cost, over = np.asarray(tables.costs(reads, lens, starts)[0]), \
        np.asarray(tables.costs(reads, lens, starts)[1])
    n_checked = 0
    for i, (r, s) in enumerate(entries):
        if over[i]:
            continue
        res = ver.verify(r, s)
        dfs_cost = res[0] if res is not None else None
        dp = int(cost[i])
        if dfs_cost is None:
            assert dp > 2, (i, dp)
        else:
            assert dp == dfs_cost, (i, dp, dfs_cost, s)
        n_checked += 1
    assert n_checked >= E * 0.6, (n_checked, E)


def test_aligner_device_verify_bit_identical():
    """GeneAligner(device_verify='on') must return exactly the default
    path's alignments (the DP only reorders which proposals the host DFS
    extracts; fallbacks cover band overflow and the hap constraint)."""
    from hgtpu.align import GeneAligner
    from hgtpu.sim import simulate_reads

    spec = make_gene_msa(seed=15, n_alleles=24, length=1600, n_ins=14)
    ref, _ = build_gene_ref("A", spec["names"], spec["rows"],
                            spec["ref_allele"],
                            exons_ref_coords=spec["exons"],
                            min_var_freq=8.0)
    host = GeneAligner(ref)
    dev = GeneAligner(ref, device_verify="on")
    rng = np.random.default_rng(9)
    r1, r2, _ = simulate_reads(ref, list(ref.allele_names[:3]),
                               simulate_interval=9, perbase_errorrate=2.0,
                               seed=0.25)
    names = [r.name for r in r1] + [r.name for r in r2]
    seqs = [r.seq for r in r1] + [r.seq for r in r2]
    for i in range(15):
        n = int(rng.integers(40, 110))
        seqs.append("".join("ACGT"[c] for c in rng.integers(0, 4, n)))
        names.append("junk%d" % i)

    def key(a):
        if a is None:
            return None
        return (a.pos, a.right, a.nm, a.is_rc, a.seq,
                tuple(map(tuple, a.cmp)))

    a_host = host.align_batch(names, seqs, "L")
    a_dev = dev.align_batch(names, seqs, "L")
    for h, d, nm in zip(a_host, a_dev, names):
        assert key(h) == key(d), nm
