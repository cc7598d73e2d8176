"""End-to-end closed-loop typing tests — the equivalent of the
reference's `--debug basic,test_size:N,set_seed:S` self-test
(typing_core.py:2488-2648) plus pair tests (hg_test2)."""
import pytest

from hgtpu.db import build_gene_ref
from hgtpu.pipeline import simulation_sweep, type_reads
from hgtpu.typer.engine import TypingOptions
from hgtpu.sim import simulate_reads
from tests.synth import make_gene_msa


@pytest.fixture(scope="module")
def generef():
    spec = make_gene_msa(seed=11)
    ref, _ = build_gene_ref(
        "A", spec["names"], spec["rows"], spec["ref_allele"],
        exons_ref_coords=spec["exons"],
        primary_exon_idx=spec["primary_exon_idx"], min_var_freq=0.0,
    )
    return ref


def test_basic_simulation_sweep(generef):
    # hg_test1 equivalent: single-allele draws, paired reads, truth must
    # rank #1 by abundance
    n, results = simulation_sweep(generef, test_size=5, seed=101,
                                  simulate_interval=3)
    assert n == 5
    for alleles, res in results:
        assert res.prob[0][0] == alleles[0]
        # reference golden: true allele at exactly 100.00%
        # (devel/hg_test1_basic/*.report)
        assert res.prob[0][1] >= 0.9999
        assert res.counts[0][0] == alleles[0]
        assert res.num_pairs > 0


def test_pair_simulation(generef):
    # hg_test2 equivalent: two-allele (heterozygous) draws; both alleles
    # must rank in the top 2
    n, results = simulation_sweep(generef, test_size=3, seed=7,
                                  allele_count=2, simulate_interval=3)
    assert n == 6  # per-allele tally: 2 alleles x 3 tests
    for alleles, res in results:
        top2 = {res.prob[0][0], res.prob[1][0]}
        assert top2 == set(alleles)


def test_single_end(generef):
    # single-end reads require allow_discordant (as in the reference's
    # "single-end" debug mode)
    allele = generef.allele_names[4]
    r1, _, _ = simulate_reads(generef, [allele], simulate_interval=3)
    res = type_reads(generef, [(r.name, r.seq) for r in r1], None,
                     TypingOptions(simulation=True, allow_discordant=True))
    assert res.prob[0][0] == allele


def test_report_writer(tmp_path, generef):
    from hgtpu.typer.report import ReportWriter
    allele = generef.allele_names[11]
    r1, r2, _ = simulate_reads(generef, [allele], simulate_interval=3)
    res = type_reads(generef, [(r.name, r.seq) for r in r1],
                     [(r.name, r.seq) for r in r2])
    path = str(tmp_path / "out.report")
    w = ReportWriter(path)
    w.header(command="hgtpu test")
    w.begin_aligner()
    w.gene_result(res, simulation=True, true_alleles=[allele])
    w.close()
    text = open(path).read()
    assert "reads and" in text and "pairs are aligned" in text
    assert ("*** 1 ranked %s" % allele) in text
    assert "(abundance:" in text


def test_zero_mapped_reads(generef):
    # garbage input must produce an empty, crash-free result
    import random
    rng = random.Random(1)
    junk = [("j%d" % i, "".join(rng.choice("ACGT") for _ in range(100)))
            for i in range(20)]
    res = type_reads(generef, junk, None,
                     TypingOptions(simulation=False, allow_discordant=True))
    assert res.num_reads == 0
    assert res.prob == []
    assert res.counts == []


def test_debug_test_list_and_id(generef):
    # explicit draws + index filter (ref: --debug test_list / test_id)
    target = generef.allele_names[9]
    n, results = simulation_sweep(generef, simulate_interval=5,
                                  test_list=[[target]])
    assert n == 1 and results[0][0] == [target]
    n, results = simulation_sweep(generef, test_size=4, seed=3,
                                  simulate_interval=5, test_ids={2})
    assert len(results) == 1


def test_insertion_allele_typing_and_assembly():
    # alleles carrying insertion variants (min_var_freq above carrier
    # fraction) must type and phase exactly
    spec = make_gene_msa(seed=3, n_alleles=40)
    from hgtpu.db import build_gene_ref
    ref, _ = build_gene_ref(
        "A", spec["names"], spec["rows"], spec["ref_allele"],
        exons_ref_coords=spec["exons"],
        primary_exon_idx=spec["primary_exon_idx"], min_var_freq=8.0)
    ins_alleles = [n for n in ref.allele_names
                   if any(ref.var_type[v] == 2
                          for v in ref.allele_var_indices(n))]
    assert ins_alleles
    allele = ins_alleles[0]
    r1, r2, _ = simulate_reads(ref, [allele], simulate_interval=4)
    res = type_reads(ref, [(r.name, r.seq) for r in r1],
                     [(r.name, r.seq) for r in r2],
                     TypingOptions(simulation=True, assembly=True))
    assert res.prob[0][0] == allele
    assert res.prob[0][1] >= 0.9999
    assert res.assembly_call and res.assembly_call[0] == [allele, allele]


def test_indel_clean_fast_path_matches_read_hts():
    """The batched nm==0 catalog-indel fast path must produce exactly
    read_hts' ht set for every alignment it resolves (bit-identity of
    the typing hot loop)."""
    from hgtpu.align import GeneAligner
    from hgtpu.db.catalog import VT_DELETION, VT_INSERTION
    from hgtpu.typer.engine import GeneTyper, NovelVars
    from hgtpu.typer.mpileup import Mpileup
    from tests.synth import make_gene_msa

    spec = make_gene_msa(seed=3, n_alleles=40)
    ref, _ = build_gene_ref("A", spec["names"], spec["rows"],
                            spec["ref_allele"], min_var_freq=8.0)
    d = ref.var_type == VT_DELETION
    ins = ref.var_type == VT_INSERTION
    truth = next(n for a, n in enumerate(ref.allele_names)
                 if ref.links[d, a].any() and ref.links[ins, a].any())
    r1, r2, _ = simulate_reads(ref, [truth], simulate_interval=2, seed=11)
    al = GeneAligner(ref)
    typer_ = GeneTyper(ref, TypingOptions(simulation=True))
    batches = al.align_batches(
        [([r.name for r in r1], [r.seq for r in r1], "L"),
         ([r.name for r in r2], [r.seq for r in r2], "R")])
    alns = [a for g in batches for a in g if a is not None]
    mp = Mpileup(ref)
    mp.add_alignments_bulk(alns)
    mp.finalize()
    uniq = {}
    for a in alns:
        if a.nm != 0:
            continue
        catalog = all(e[0] == "match" or (e[3] is not None and e[3] >= 0)
                      for e in a.cmp)
        indel = any(e[0] in ("deletion", "insertion") for e in a.cmp)
        if catalog and indel:
            uniq.setdefault((a.pos, a.seq), a)
    assert len(uniq) > 100
    memo = {}
    typer_.indel_clean_hts_batch(list(uniq.values()), mp, True, memo)
    assert len(memo) > 0.4 * len(uniq)
    novel = NovelVars()
    for k, a in uniq.items():
        if k in memo:
            assert memo[k] == typer_.read_hts(a, novel, mp), k


def test_may_trim_gate_conservative():
    """The reach-based alt-trim gate (engine.may_trim) must route every
    read where identify_ambiguous_diffs would fire to the slow path:
    hts computed with the gate must equal hts with the gate forced open
    (always slow) for every unique alignment — including reads whose
    span overlaps alt anchors whose equivalence stays interior."""
    import numpy as np

    from hgtpu.align import GeneAligner
    from hgtpu.typer.engine import GeneTyper, NovelVars
    from hgtpu.typer.mpileup import Mpileup
    from tests.synth import make_gene_msa

    spec = make_gene_msa(seed=3, n_alleles=40)
    ref, _ = build_gene_ref("A", spec["names"], spec["rows"],
                            spec["ref_allele"], min_var_freq=0.1)
    truths = [ref.allele_names[7], ref.allele_names[3]]
    r1, r2, _ = simulate_reads(ref, truths, simulate_interval=3, seed=11)
    al = GeneAligner(ref)
    batches = al.align_batches(
        [([r.name for r in r1], [r.seq for r in r1], "L"),
         ([r.name for r in r2], [r.seq for r in r2], "R")])
    alns = [a for g in batches for a in g if a is not None]
    mp = Mpileup(ref)
    mp.add_alignments_bulk(alns)
    mp.finalize()
    typer_ = GeneTyper(ref, TypingOptions())
    gated = {}
    novel = NovelVars()
    for a in alns:
        gated.setdefault((a.pos, a.seq), typer_.read_hts(a, novel, mp))
    # the gate must actually clear some alt-overlapping reads, or this
    # test degenerates
    spans = np.array([[p, p + len(s) - 1] for p, s in gated])
    assert (~typer_.may_trim(spans[:, 0], spans[:, 1])).sum() > 0
    forced = GeneTyper(ref, TypingOptions())
    forced.may_trim = lambda lo, hi: np.ones(
        np.atleast_1d(np.asarray(lo)).shape, bool)
    novel2 = NovelVars()
    for k, a in ((k, a) for a in alns
                 for k in [(a.pos, a.seq)] if k in gated):
        assert gated[k] == forced.read_hts(a, novel2, mp), k
