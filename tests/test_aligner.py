"""Aligner tests: simulated reads must be placed at their true backbone
position with exactly the true variant list (hit-identity vs the
simulator oracle — the strategy SURVEY.md §7 step 3 calls for)."""
import numpy as np
import pytest

from hgtpu.align import GeneAligner
from hgtpu.db import build_gene_ref
from hgtpu.sim import simulate_reads, parse_truth_name
from tests.synth import make_gene_msa


@pytest.fixture(scope="module")
def generef():
    spec = make_gene_msa(seed=11)
    ref, _ = build_gene_ref(
        "A", spec["names"], spec["rows"], spec["ref_allele"],
        exons_ref_coords=spec["exons"], min_var_freq=0.0,
    )
    return ref


@pytest.fixture(scope="module")
def aligner(generef):
    return GeneAligner(generef)


def _check_against_truth(generef, alns, reads, mate):
    n_pos_ok = n_var_ok = n = 0
    for aln, r in zip(alns, reads):
        t = parse_truth_name(r.name)
        assert aln is not None, r.name
        assert aln.nm == 0, (r.name, aln.cmp)
        n += 1
        if aln.pos == t["pos"]:
            n_pos_ok += 1
        got_vars = {generef.var_ids[e[3]] for e in aln.cmp
                    if e[0] != "match" and e[3] is not None and e[3] >= 0}
        if got_vars == set(t["vars"]):
            n_var_ok += 1
        if mate == "R":
            assert aln.is_rc
    assert n_pos_ok == n, "all reads placed at true position"
    # variant-identity: end-ambiguous spellings may legitimately differ
    # before Alts trimming; require near-total identity
    assert n_var_ok >= n * 0.97, (n_var_ok, n)
    return n


def test_left_reads_exact(generef, aligner):
    for allele in generef.allele_names[:6]:
        r1, r2, _ = simulate_reads(generef, [allele], simulate_interval=29)
        alns = aligner.align_batch([r.name for r in r1],
                                   [r.seq for r in r1], "L")
        _check_against_truth(generef, alns, r1, "L")


def test_right_reads_rc(generef, aligner):
    allele = generef.allele_names[9]
    _, r2, _ = simulate_reads(generef, [allele], simulate_interval=31)
    alns = aligner.align_batch([r.name for r in r2],
                               [r.seq for r in r2], "R")
    _check_against_truth(generef, alns, r2, "R")


def test_read_with_errors_gets_novel_mismatch(generef, aligner):
    allele = generef.allele_names[2]
    aseq = generef.allele_seq(allele)
    read = aseq[100:200]
    # inject 2 novel errors away from variant sites
    read = read[:10] + ("A" if read[10] != "A" else "C") + read[11:]
    read = read[:80] + ("G" if read[80] != "G" else "T") + read[81:]
    alns = aligner.align_batch(["e1"], [read], "L")
    assert alns[0] is not None
    assert 0 < alns[0].nm <= 2


def test_garbage_read_unmapped(aligner):
    import random
    rng = random.Random(5)
    junk = "".join(rng.choice("ACGT") for _ in range(100))
    alns = aligner.align_batch(["junk"], [junk], "L")
    assert alns[0] is None


def test_softclip_boundary_reads(generef, aligner):
    # reads overhanging backbone ends map with their overlap soft-clipped
    # (the reference trims hisat2 soft clips, typing_core.py:1097-1107)
    bb = generef.backbone
    import random
    rng = random.Random(2)
    tail = "".join(rng.choice("ACGT") for _ in range(25))
    lead_read = tail + bb[:75]            # 25bp overhang at the left end
    tail_read = bb[-75:] + tail           # 25bp overhang at the right end
    alns = aligner.align_batch(["lead", "tail"], [lead_read, tail_read], "L")
    a0, a1 = alns
    assert a0 is not None and a0.pos == 0 and a0.nm == 0
    assert len(a0.seq) == 75              # clipped to the overlap
    assert a1 is not None and a1.right == len(bb) and a1.nm == 0
    assert len(a1.seq) == 75


def test_native_verifier_matches_python(generef):
    # the C++ verifier must be bit-identical to the Python DFS
    from hgtpu.align.native_verify import NativeVerifier, native_available
    from hgtpu.align.verify import GeneVerifier
    from hgtpu.utils.dna import encode_seq

    if not native_available():
        import pytest
        pytest.skip("native library not built")
    nv = NativeVerifier(generef)
    pv = GeneVerifier(generef)
    import random
    rng = random.Random(7)
    reads, starts, expects = [], [], []
    for t in range(300):
        allele = generef.allele_names[rng.randrange(generef.n_alleles)]
        aseq = generef.allele_seq(allele)
        p = rng.randrange(0, len(aseq) - 100)
        seq = aseq[p:p + 100]
        if t % 3 == 0:  # inject novel errors
            j = rng.randrange(100)
            seq = seq[:j] + rng.choice("ACGT") + seq[j + 1:]
        codes = encode_seq(seq)
        # probe several starts incl. wrong ones
        for s in (p, max(0, p - 3), p + 2):
            reads.append(codes)
            starts.append(min(s, len(generef.backbone) - 1))
            expects.append(pv.verify(codes, starts[-1]))
    cost, ops = nv.verify_flat(reads, starts)
    n_ok = 0
    for i, exp in enumerate(expects):
        if exp is None:
            assert cost[i] == -1, i
        else:
            assert cost[i] == exp[0], (i, cost[i], exp[0])
            assert ops[i] == exp[1], (i, ops[i][:4], exp[1][:4])
            n_ok += 1
    assert n_ok > 100  # most exact-start probes verify


def _aln_key(a):
    if a is None:
        return None
    return (a.pos, a.right, a.nm, a.is_rc, a.seq,
            tuple((k, p, ln, v, d) for k, p, ln, v, d in a.cmp))


def test_batched_fast_path_matches_dfs(generef):
    """The chunk-wide exact-diagonal fast path must produce exactly the
    alignments the DFS slow path would (positions, cmp lists, costs)."""
    import hgtpu.sim as sim

    fast = GeneAligner(generef)
    slow = GeneAligner(generef)
    slow._fast_exact_batch = lambda *a, **kw: {}   # force DFS for all

    rng = np.random.default_rng(17)
    r1, r2, _ = sim.simulate_reads(
        generef, list(generef.allele_names[:3]), simulate_interval=7,
        perbase_errorrate=2.0, seed=0.5)
    names = [r.name for r in r1] + [r.name for r in r2]
    seqs = [r.seq for r in r1] + [r.seq for r in r2]
    # plus random junk and clipped reads
    for i in range(20):
        n = int(rng.integers(40, 110))
        seqs.append("".join("ACGT"[c] for c in rng.integers(0, 4, n)))
        names.append("junk%d" % i)
    a_fast = fast.align_batch(names, seqs, "L")
    a_slow = slow.align_batch(names, seqs, "L")
    assert len(a_fast) == len(a_slow)
    for f, s, nm in zip(a_fast, a_slow, names):
        assert _aln_key(f) == _aln_key(s), nm


def test_fanout_clone_equiv():
    """The dedup fan-out path shallow-clones ReadAln via object.__new__ +
    __dict__ copy; guard that this stays equivalent to real construction
    (breaks if ReadAln ever gains __slots__ or a __post_init__)."""
    import dataclasses
    from hgtpu.align.types import ReadAln

    src = ReadAln(read_id="r1", mate="L", pos=5, right=105,
                  cmp=[("match", 5, 100, -1, "")], nm=0, is_rc=False,
                  seq="A" * 100)
    clone = object.__new__(ReadAln)
    clone.__dict__ = dict(src.__dict__)
    clone.read_id = "r2"
    want = dataclasses.replace(src, read_id="r2")
    assert clone == want
    assert not hasattr(ReadAln, "__slots__")
    assert not hasattr(ReadAln, "__post_init__")


def test_fast_indel_batch_matches_verifier():
    """The chunk-wide single-indel fast path must return exactly the
    alignments the proposal+DFS machinery produces: same start, cost,
    orientation and edit script for every read, on an indel-dense gene."""
    from hgtpu.align import GeneAligner
    from hgtpu.db import build_gene_ref
    from hgtpu.sim import simulate_reads
    from tests.synth import make_gene_msa

    spec = make_gene_msa(seed=3, n_alleles=40)
    ref, _ = build_gene_ref("A", spec["names"], spec["rows"],
                            spec["ref_allele"], min_var_freq=8.0)
    reads, names = [], []
    import random
    rng = random.Random(9)
    for a in (1, 5, 9, 13):
        r1, r2, _ = simulate_reads(ref, [ref.allele_names[a]],
                                   simulate_interval=5, seed=a)
        for r in r1 + r2:
            names.append("%d_%s" % (a, r.name))
            seq = r.seq
            if rng.random() < 0.2:   # sprinkle sequencing errors
                i = rng.randrange(len(seq))
                seq = seq[:i] + rng.choice("ACGT") + seq[i + 1:]
            reads.append(seq)

    fast = GeneAligner(ref)
    slow = GeneAligner(ref)
    slow._fast_indel_batch = lambda *a, **k: {}
    out_f = fast.align_batch(names, reads, "L")
    out_s = slow.align_batch(names, reads, "L")
    n_checked = 0
    for af, as_ in zip(out_f, out_s):
        assert (af is None) == (as_ is None)
        if af is None:
            continue
        assert (af.pos, af.nm, af.is_rc) == (as_.pos, as_.nm, as_.is_rc)
        assert af.cmp == as_.cmp, (af.read_id, af.cmp, as_.cmp)
        n_checked += 1
    assert n_checked > 0.9 * len(reads)


def test_place_scan_matches_host_planes():
    """The fused device scan (place_scan_batch planes + mismatch slots)
    and the host sparse-plane fallback must produce identical alignments
    — same placement, cost, orientation, edit script and alt set — on an
    indel-dense gene with sprinkled errors."""
    from hgtpu.align import GeneAligner
    from hgtpu.db import build_gene_ref
    from hgtpu.sim import simulate_reads
    from tests.synth import make_gene_msa

    spec = make_gene_msa(seed=7, n_alleles=40)
    ref, _ = build_gene_ref("A", spec["names"], spec["rows"],
                            spec["ref_allele"], min_var_freq=8.0)
    reads, names = [], []
    import random
    rng = random.Random(3)
    for a in (0, 4, 11, 17):
        r1, r2, _ = simulate_reads(ref, [ref.allele_names[a]],
                                   simulate_interval=5, seed=a + 1)
        for r in r1 + r2:
            names.append("%d_%s" % (a, r.name))
            seq = r.seq
            if rng.random() < 0.25:
                i = rng.randrange(len(seq))
                seq = seq[:i] + rng.choice("ACGT") + seq[i + 1:]
            reads.append(seq)

    scan = GeneAligner(ref, place_scan="on")
    host = GeneAligner(ref, place_scan="off")
    assert scan._use_scan and not host._use_scan
    out_a = scan.align_batch(names, reads, "L")
    out_b = host.align_batch(names, reads, "L")
    n_mapped = 0
    for aa, ab in zip(out_a, out_b):
        assert (aa is None) == (ab is None)
        if aa is None:
            continue
        assert (aa.pos, aa.right, aa.nm, aa.is_rc) == \
            (ab.pos, ab.right, ab.nm, ab.is_rc)
        assert aa.cmp == ab.cmp, (aa.read_id, aa.cmp, ab.cmp)
        n_mapped += 1
    assert n_mapped > 0.9 * len(reads)
