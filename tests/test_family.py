"""Multi-gene family typing and WGS-style read extraction
(hg_test4/5-equivalent flows: extract-reads -> per-locus typing)."""
import random

import pytest

from hgtpu.db import build_catalog_from_msa
from hgtpu.pipeline import ReadExtractor, type_family
from hgtpu.sim import simulate_reads
from tests.synth import make_family


@pytest.fixture(scope="module")
def family():
    fam = make_family(genes=("A", "B"), n_alleles=16, length=1600, seed=21)
    cat = build_catalog_from_msa(
        "hla",
        {g: dict(names=s["names"], rows=s["rows"], ref_allele=s["ref_allele"],
                 exons=s["exons"], primary_exon_idx=s["primary_exon_idx"])
         for g, s in fam["specs"].items()},
        min_var_freq=0.0,
    )
    return fam, cat


def test_type_family_routes_reads(family):
    fam, cat = family
    a_allele = cat.gene("A").allele_names[5]
    b_allele = cat.gene("B").allele_names[9]
    rA1, rA2, _ = simulate_reads(cat.gene("A"), [a_allele],
                                 simulate_interval=4)
    rB1, rB2, _ = simulate_reads(cat.gene("B"), [b_allele],
                                 simulate_interval=4)
    reads_1 = [("a%d|L" % i, r.seq) for i, r in enumerate(rA1)] \
        + [("b%d|L" % i, r.seq) for i, r in enumerate(rB1)]
    reads_2 = [("a%d|R" % i, r.seq) for i, r in enumerate(rA2)] \
        + [("b%d|R" % i, r.seq) for i, r in enumerate(rB2)]
    results = type_family(cat, reads_1, reads_2)
    assert results["A"].prob[0][0] == a_allele
    assert results["B"].prob[0][0] == b_allele
    # reads must not leak across genes
    assert results["A"].num_pairs >= len(rA1) * 0.9
    assert results["B"].num_pairs >= len(rB1) * 0.9


def test_read_extraction(family):
    fam, cat = family
    genome = fam["genome"]
    rng = random.Random(3)
    # WGS-style reads: gene reads + background genome reads
    a_allele = cat.gene("A").allele_names[2]
    rA1, rA2, _ = simulate_reads(cat.gene("A"), [a_allele],
                                 simulate_interval=6)
    bg_1, bg_2 = [], []
    for i in range(60):
        # background fragments from the flank regions only
        p = rng.choice([rng.randrange(0, 2800),
                        rng.randrange(len(genome) - 2900, len(genome) - 350)])
        frag = genome[p:p + 250]
        bg_1.append(("bg%d" % i, frag[:100]))
        from hgtpu.utils.dna import revcomp
        bg_2.append(("bg%d" % i, revcomp(frag[-100:])))
    reads_1 = [("a%d" % i, r.seq) for i, r in enumerate(rA1)] + bg_1
    reads_2 = [("a%d" % i, r.seq) for i, r in enumerate(rA2)] + bg_2
    ex = ReadExtractor({"hla": cat})
    routed = ex.extract(reads_1, reads_2)
    assert "hla" in routed
    r1, r2 = routed["hla"]
    names = {n for n, _ in r1}
    # all gene reads extracted, essentially no background
    assert sum(1 for n in names if n.startswith("a")) >= len(rA1) * 0.95
    assert sum(1 for n in names if n.startswith("bg")) <= 2


def test_genome_scale_extraction(family, tmp_path):
    """WGS routing against the spliced genotype genome via the FM index
    (the reference's extract_reads design, typing_process.py:1330-1784)."""
    import random

    from hgtpu.db.genome import build_genotype_genome
    from hgtpu.pipeline.extract_genome import GenomeExtractor
    from hgtpu.utils.dna import revcomp

    fam, cat = family
    for g, (left, right) in fam["loci"].items():
        cat.genes[g].chrom = "chrS"
        cat.genes[g].chrom_left = left
        cat.genes[g].chrom_right = right
    out = str(tmp_path / "gg" / "genotype_genome")
    spliced, offsets = build_genotype_genome({"chrS": fam["genome"]},
                                             {"hla": cat}, out)
    ex = GenomeExtractor(spliced, offsets, {"hla": cat})

    a_allele = cat.gene("A").allele_names[3]
    rA1, rA2, _ = simulate_reads(cat.gene("A"), [a_allele],
                                 simulate_interval=8)
    genome = fam["genome"]
    rng = random.Random(9)
    bg_1, bg_2 = [], []
    for i in range(50):
        p = rng.randrange(0, 2700)
        frag = genome[p:p + 250]
        bg_1.append(("bg%d" % i, frag[:100]))
        bg_2.append(("bg%d" % i, revcomp(frag[-100:])))
    reads_1 = [("a%d" % i, r.seq) for i, r in enumerate(rA1)] + bg_1
    reads_2 = [("a%d" % i, r.seq) for i, r in enumerate(rA2)] + bg_2
    routed = ex.extract(reads_1, reads_2)
    assert "hla" in routed
    names = {n for n, _ in routed["hla"][0]}
    got_gene = sum(1 for n in names if n.startswith("a"))
    got_bg = sum(1 for n in names if n.startswith("bg"))
    assert got_gene >= len(rA1) * 0.9, (got_gene, len(rA1))
    assert got_bg <= 2
    # extracted reads type correctly
    from hgtpu.pipeline import type_family as tf
    res = tf(cat, *routed["hla"])
    assert res["A"].prob[0][0] == a_allele


def test_router_matches_exhaustive():
    """FamilyAligner's panel-router path must agree with the exhaustive
    per-gene path on which reads are kept and their costs (3-gene
    family triggers route='auto')."""
    from hgtpu.align.family import FamilyAligner
    from hgtpu.db import build_catalog_from_msa

    fam = make_family(genes=("A", "B", "C"), n_alleles=10, length=1200,
                      seed=33)
    cat = build_catalog_from_msa(
        "hla",
        {g: dict(names=s["names"], rows=s["rows"],
                 ref_allele=s["ref_allele"], exons=s["exons"],
                 primary_exon_idx=s["primary_exon_idx"])
         for g, s in fam["specs"].items()},
        min_var_freq=0.0)
    reads = []
    rng = random.Random(5)
    for g in ("A", "B", "C"):
        ref = cat.gene(g)
        r1, _, _ = simulate_reads(ref, [ref.allele_names[2]],
                                  simulate_interval=12, seed=rng.random())
        reads += [("%s%d" % (g, i), r.seq) for i, r in enumerate(r1)]
    # plus background reads that map nowhere
    for i in range(20):
        reads.append(("bg%d" % i,
                      "".join(rng.choice("ACGT") for _ in range(100))))
    ids = [n for n, _ in reads]
    seqs = [s for _, s in reads]
    fa_router = FamilyAligner(cat, route="on")
    fa_exh = FamilyAligner(cat, route="off")
    assert fa_router.router is not None and fa_exh.router is None
    pr = fa_router.align_batch(ids, seqs, "L")
    pe = fa_exh.align_batch(ids, seqs, "L")
    for g in ("A", "B", "C"):
        for i in range(len(reads)):
            ar, ae = pr[g][i], pe[g][i]
            assert (ar is None) == (ae is None), (g, ids[i])
            if ar is not None:
                assert ar.nm == ae.nm and ar.pos == ae.pos
