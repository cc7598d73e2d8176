"""Genome-scale extraction parity (VERDICT r1 item 4): verify-confirmed
NH==1 routing, two-family WGS sim, 20-Mbp-style block binning, and
ambiguous-read rejection (ref: typing_process.py:1534-1716)."""
import gzip
import random

import pytest

from hgtpu.db import build_catalog_from_msa
from hgtpu.db.genome import build_genotype_genome
from hgtpu.pipeline.extract_genome import GenomeExtractor, write_block_fastqs
from hgtpu.sim import simulate_reads
from hgtpu.utils.dna import revcomp
from tests.synth import make_family


@pytest.fixture(scope="module")
def wgs(tmp_path_factory):
    fam = make_family(genes=("A", "B"), n_alleles=12, length=1500, seed=41)
    cat_hla = build_catalog_from_msa(
        "hla", {"A": _spec(fam, "A")}, min_var_freq=0.0)
    cat_cyp = build_catalog_from_msa(
        "cyp", {"B": _spec(fam, "B")}, min_var_freq=0.0)
    for c in (cat_hla, cat_cyp):
        for g, ref in c.genes.items():
            left, right = fam["loci"][g]
            ref.chrom = "chrS"
            ref.chrom_left = left
            ref.chrom_right = right
    out = str(tmp_path_factory.mktemp("gg") / "genotype_genome")
    spliced, offsets = build_genotype_genome(
        {"chrS": fam["genome"]}, {"hla": cat_hla, "cyp": cat_cyp}, out)
    ex = GenomeExtractor(spliced, offsets,
                         {"hla": cat_hla, "cyp": cat_cyp})
    return fam, cat_hla, cat_cyp, ex


def _spec(fam, g):
    s = fam["specs"][g]
    return dict(names=s["names"], rows=s["rows"],
                ref_allele=s["ref_allele"], exons=s["exons"],
                primary_exon_idx=s["primary_exon_idx"])


def test_two_family_wgs_extract_and_type(wgs):
    """Splice two families into a toy genome, extract, and type both
    correctly — VERDICT item 4's done criterion."""
    from hgtpu.pipeline import type_family

    fam, cat_hla, cat_cyp, ex = wgs
    a_allele = cat_hla.gene("A").allele_names[4]
    b_allele = cat_cyp.gene("B").allele_names[7]
    rA1, rA2, _ = simulate_reads(cat_hla.gene("A"), [a_allele],
                                 simulate_interval=6, seed=1)
    rB1, rB2, _ = simulate_reads(cat_cyp.gene("B"), [b_allele],
                                 simulate_interval=6, seed=2)
    rng = random.Random(9)
    genome = fam["genome"]
    bg_1, bg_2 = [], []
    # background fragments drawn strictly outside both loci
    loci = sorted(fam["loci"].values())
    for i in range(40):
        while True:
            p = rng.randrange(0, len(genome) - 260)
            if all(p + 250 <= l or p >= r for l, r in loci):
                break
        frag = genome[p:p + 250]
        bg_1.append(("x%d" % i, frag[:100]))
        bg_2.append(("x%d" % i, revcomp(frag[-100:])))
    reads_1 = [("a%d" % i, r.seq) for i, r in enumerate(rA1)] \
        + [("b%d" % i, r.seq) for i, r in enumerate(rB1)] + bg_1
    reads_2 = [("a%d" % i, r.seq) for i, r in enumerate(rA2)] \
        + [("b%d" % i, r.seq) for i, r in enumerate(rB2)] + bg_2
    routed = ex.extract(reads_1, reads_2)
    assert set(routed) >= {"hla", "cyp"}
    hla_names = {n for n, _ in routed["hla"][0]}
    cyp_names = {n for n, _ in routed["cyp"][0]}
    assert sum(1 for n in hla_names if n.startswith("a")) >= len(rA1) * 0.9
    assert sum(1 for n in cyp_names if n.startswith("b")) >= len(rB1) * 0.9
    # no cross-family leakage of gene reads, no background routing
    assert not any(n.startswith("b") for n in hla_names)
    assert not any(n.startswith("a") for n in cyp_names)
    assert sum(1 for n in hla_names | cyp_names
               if n.startswith("x")) <= 2
    res = type_family(cat_hla, *routed["hla"])
    assert res["A"].prob[0][0] == a_allele
    res = type_family(cat_cyp, *routed["cyp"], opts=None)
    assert res["B"].prob[0][0] == b_allele


def test_block_binning(wgs, tmp_path):
    """block_size routing mirrors the reference's whole-genome binning
    (chr, pos // block_size) and the gzip filename convention."""
    fam, cat_hla, _cat_cyp, ex = wgs
    genome = fam["genome"]
    rng = random.Random(3)
    reads_1, reads_2 = [], []
    for i in range(30):
        p = rng.randrange(0, len(genome) - 260)
        frag = genome[p:p + 250]
        reads_1.append(("r%d" % i, frag[:100]))
        reads_2.append(("r%d" % i, revcomp(frag[-100:])))
    block = 2_000_000
    fams, blocks = ex.extract(reads_1, reads_2, block_size=block)
    assert blocks, "no blocks routed"
    for (chrom, bi), (r1, r2) in blocks.items():
        assert chrom == "chrS"
        assert len(r1) == len(r2)
        assert len(r1) > 0
    total = sum(len(r1) for r1, _ in blocks.values())
    assert total >= 25   # nearly every unique read lands in a block
    paths = write_block_fastqs(str(tmp_path), "samp", blocks, block,
                               paired=True)
    assert paths and all(p.endswith(".fq.gz") for p in paths)
    assert any("-chrS-0_2M-extracted-1.fq.gz" in p for p in paths)
    with gzip.open(paths[0], "rt") as f:
        lines = f.read().splitlines()
    assert lines[0].startswith("@") and set(lines[1]) <= set("ACGTN")


def test_indel_rich_str_locus_routing(tmp_path_factory):
    """Routing fidelity at a CODIS-magnitude indel locus (VERDICT r2 weak
    #9): reads from an allele 6 repeat units LONGER than the spliced
    backbone cross a 24-bp insertion that defeats the Hamming check, so
    routing must come from the both-ends-unique consistent-seed fallback
    — and the routed set must still type the truth allele at 100%
    (ref: the graph-aware NH==1 routing, typing_process.py:1683-1699)."""
    import random as _random

    from hgtpu.pipeline import type_family
    from hgtpu.tools.codis import codis_msa

    rng = _random.Random(23)
    f5 = "".join(rng.choice("ACGT") for _ in range(400))
    f3 = "".join(rng.choice("ACGT") for _ in range(400))
    table = [
        ("D18S51*10", "[AGAA]10"),
        ("D18S51*12", "[AGAA]12"),
        ("D18S51*13", "[AGAA]13"),
        ("D18S51*14.2", "[AGAA]13 GA [AGAA]1"),
        ("D18S51*16", "[AGAA]16"),
    ]
    names, rows = codis_msa(table, f5, f3)
    cat = build_catalog_from_msa(
        "codis", {"D18S51": dict(names=names, rows=rows,
                                 ref_allele=names[0])},
        min_var_freq=0.0, collapse=False, leftshift=False)
    g = cat.gene("D18S51")
    flank = 2500
    genome = ("".join(rng.choice("ACGT") for _ in range(flank))
              + g.allele_seq(names[0])
              + "".join(rng.choice("ACGT") for _ in range(flank)))
    g.chrom = "chrS"
    g.chrom_left = flank
    g.chrom_right = flank + len(g.allele_seq(names[0]))
    out = str(tmp_path_factory.mktemp("strgg") / "genotype_genome")
    spliced, offsets = build_genotype_genome(
        {"chrS": genome}, {"codis": cat}, out)
    ex = GenomeExtractor(spliced, offsets, {"codis": cat})

    truth = "D18S51*16"          # 6 units past the backbone's [AGAA]10
    r1, r2, _ = simulate_reads(g, [truth], simulate_interval=3,
                               frag_len=300, seed=5)
    reads_1 = [("s%d" % i, r.seq) for i, r in enumerate(r1)]
    reads_2 = [("s%d" % i, r.seq) for i, r in enumerate(r2)]
    routed = ex.extract(reads_1, reads_2)
    assert "codis" in routed, "STR locus reads did not route at all"
    got = len(routed["codis"][0])
    assert got >= 0.9 * len(reads_1), \
        "indel-rich routing lost %d/%d pairs" % (len(reads_1) - got,
                                                 len(reads_1))
    from hgtpu.typer.engine import TypingOptions
    res = type_family(cat, *routed["codis"],
                      opts=TypingOptions(family="codis", simulation=True))
    assert res["D18S51"].prob[0][0] == truth
    assert res["D18S51"].prob[0][1] >= 0.9999


def test_ambiguous_reads_rejected(wgs):
    """A read from a duplicated segment (two verified placements) must
    not route — NH==1 semantics, not seed votes."""
    fam, _h, _c, ex = wgs
    genome = fam["genome"]
    # duplicate a locus-A segment elsewhere by constructing a synthetic
    # genome copy; simpler: a read matching two genome positions — take
    # a segment and also verify it can't be unique by searching itself
    left, right = fam["loci"]["A"]
    seg = genome[left + 100:left + 200]
    dup_genome = {"chrS": genome, "chrDup": genome[left:right]}
    from hgtpu.db.catalog import import_text  # noqa: F401 (parity import)
    ex2 = GenomeExtractor(dup_genome, {}, {})
    starts = ex2._place_unique([seg])
    assert starts == [None]   # two identical placements -> ambiguous
    # the same read against the single-copy genome IS unique
    starts = ex._place_unique([seg])
    assert starts[0] is not None
