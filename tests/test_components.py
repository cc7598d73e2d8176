"""Component tests: SAM export, validation suite, db management,
genotype-genome builder, PDF renderer."""
import os
import subprocess
import sys

import pytest

from hgtpu.db import build_gene_ref, Catalog
from hgtpu.db.catalog import export_text
from tests.synth import make_gene_msa, make_family


@pytest.fixture(scope="module")
def generef():
    spec = make_gene_msa(seed=11, n_alleles=20, length=1500)
    ref, _ = build_gene_ref(
        "A", spec["names"], spec["rows"], spec["ref_allele"],
        exons_ref_coords=spec["exons"],
        primary_exon_idx=spec["primary_exon_idx"], min_var_freq=0.0)
    return spec, ref


def test_sam_roundtrip(generef, tmp_path):
    from hgtpu.align import GeneAligner
    from hgtpu.align.sam import write_sam, parse_sam_line
    from hgtpu.sim import simulate_reads

    spec, ref = generef
    allele = ref.allele_names[4]
    r1, r2, _ = simulate_reads(ref, [allele], simulate_interval=20)
    al = GeneAligner(ref)
    alns1 = al.align_batch([r.name for r in r1], [r.seq for r in r1], "L")
    path = str(tmp_path / "out.sam")
    pairs = [(a.read_id, [a]) for a in alns1 if a]
    write_sam(path, ref, pairs)
    lines = [l for l in open(path) if not l.startswith("@")]
    assert len(lines) == len(pairs)
    rec = parse_sam_line(ref, lines[0])
    assert rec["pos"] == pairs[0][1][0].pos
    assert "NM" in rec["tags"] and "MD" in rec["tags"]
    # MD match-sum must equal read length minus insertions
    import re
    md = rec["tags"]["MD"].split(":")[-1] if ":" in rec["tags"]["MD"] \
        else rec["tags"]["MD"]
    nums = sum(int(x) for x in re.findall(r"(\d+)", md.split("^")[0]))
    assert nums >= 0


def test_validation_suite(generef):
    from hgtpu.validate import validate_gene

    spec, ref = generef
    validate_gene(ref, spec["rows"], spec["names"])


def test_db_manage(generef, tmp_path):
    from hgtpu.db import manage

    spec, ref = generef
    d = str(tmp_path / "db")
    os.makedirs(d)
    assert not manage.database_exists(d, "hla")
    export_text(Catalog(family="hla", genes={"A": ref}), d + "/hla")
    assert manage.database_exists(d, "hla")
    # build-if-missing is a no-op when present
    assert manage.extract_database_if_not_exists(d, "hla") is False
    with pytest.raises(RuntimeError):
        manage.clone_hisatgenotype_database(d)
    # inspector reconstructs sequences
    out = str(tmp_path / "insp.fa")
    manage.inspect(d + "/hla", out)
    text = open(out).read()
    assert ">A*BACKBONE" in text
    assert ">%s" % ref.allele_names[0] in text


def test_genotype_genome_build(tmp_path):
    from hgtpu.db import build_catalog_from_msa
    from hgtpu.db.genome import build_genotype_genome, liftover

    fam = make_family(genes=("A", "B"), n_alleles=10, length=1200, seed=33)
    cat = build_catalog_from_msa(
        "hla",
        {g: dict(names=s["names"], rows=s["rows"],
                 ref_allele=s["ref_allele"], exons=s["exons"])
         for g, s in fam["specs"].items()},
        min_var_freq=0.0)
    # place genes on the synthetic chromosome
    for g, (left, right) in fam["loci"].items():
        cat.genes[g].chrom = "chrS"
        cat.genes[g].chrom_left = left
        cat.genes[g].chrom_right = right
    out = str(tmp_path / "gg" / "genotype_genome")
    spliced, offsets = build_genotype_genome({"chrS": fam["genome"]},
                                             {"hla": cat}, out)
    for suffix in (".fa", ".locus", ".snp", ".haplotype", ".link",
                   ".coord", ".allele"):
        assert os.path.exists(out + suffix)
    # backbone sequences embedded at the recorded offsets
    for g in cat.genes.values():
        base = offsets[("hla", g.gene)]
        assert spliced["chrS"][base:base + len(g.backbone)] == g.backbone
    # liftover maps flanking coordinates back
    lift = liftover(out + ".coord")
    assert lift("chrS", 100) == 100
    assert lift("chrS", offsets[("hla", "A")] + 5) is None


def test_pdf_renderer(tmp_path):
    from hgtpu.assemble.pdf import draw_assembly

    path = str(tmp_path / "x.pdf")
    draw_assembly(path, 2000,
                  [("a. Read alignment",
                    [("r1", 0, 99, [10, 50]), ("r2", 50, 149, [60])]),
                   ("b. Assembly", [("c1", 0, 1999, [10, 50, 60])])],
                  coverage={"X*01:01": [0.5] * 2000},
                  exons=[(100, 400)])
    data = open(path, "rb").read()
    assert data.startswith(b"%PDF-1.7")
    assert data.rstrip().endswith(b"%%EOF")


def test_sam_ingestion_roundtrip(generef, tmp_path):
    """write_sam -> read_sam must reproduce cmp lists, and typing from
    the SAM file must call the same allele as direct typing (the
    reference's --alignment path)."""
    from collections import defaultdict

    from hgtpu.align import GeneAligner
    from hgtpu.align.sam import read_sam, write_sam
    from hgtpu.pipeline.genotype import type_from_sam
    from hgtpu.sim import simulate_reads

    spec, ref = generef
    allele = ref.allele_names[7]
    r1, r2, _ = simulate_reads(ref, [allele], simulate_interval=4)
    al = GeneAligner(ref)
    alns1 = al.align_batch([r.name for r in r1], [r.seq for r in r1], "L")
    alns2 = al.align_batch([r.name for r in r2], [r.seq for r in r2], "R")
    by = defaultdict(list)
    for a in alns1 + alns2:
        if a:
            by[a.read_id.split("|")[0]].append(a)
    groups = sorted(by.items())
    path = str(tmp_path / "x.sam")
    write_sam(path, ref, groups)
    groups2 = read_sam(ref, path)
    assert len(groups2) == len(groups)
    # cmp round trip (known variants preserved through Zs)
    orig = {a.read_id.split("|")[0] + a.mate: a
            for _, alns in groups for a in alns}
    for _, alns in groups2:
        for a in alns:
            o = orig[a.read_id + a.mate]
            assert a.pos == o.pos and a.nm == o.nm
            assert [(c[0], c[1], c[2], c[3]) for c in a.cmp] \
                == [(c[0], c[1], c[2],
                     None if (c[3] is None or c[3] < 0) else c[3])
                    for c in o.cmp] \
                or [(c[0], c[1], c[2]) for c in a.cmp] \
                == [(c[0], c[1], c[2]) for c in o.cmp]
    res = type_from_sam(ref, path)
    assert res.prob[0][0] == allele
    assert res.prob[0][1] >= 0.9999


def test_region_typing(tmp_path):
    """`--base genome` region mode: a genotype-genome slice types reads
    like the family database does (ref: typing_core.py:372-377)."""
    from hgtpu.db import build_catalog_from_msa
    from hgtpu.db.genome import build_genotype_genome, region_gene
    from hgtpu.pipeline import type_reads
    from hgtpu.sim import simulate_reads
    from hgtpu.typer.engine import TypingOptions

    fam = make_family(genes=("A",), n_alleles=12, length=1200, seed=55)
    cat = build_catalog_from_msa(
        "hla",
        {g: dict(names=s["names"], rows=s["rows"],
                 ref_allele=s["ref_allele"], exons=s["exons"])
         for g, s in fam["specs"].items()}, min_var_freq=0.0)
    g = cat.genes["A"]
    left, right = fam["loci"]["A"]
    g.chrom, g.chrom_left, g.chrom_right = "chrS", left, right
    out = str(tmp_path / "gg" / "genotype_genome")
    spliced, offsets = build_genotype_genome({"chrS": fam["genome"]},
                                             {"hla": cat}, out)
    base = offsets[("hla", "A")]
    region = region_gene(out, "chrS", base, base + len(g.backbone))
    assert region.backbone == g.backbone
    assert region.n_vars == g.n_vars
    allele = g.allele_names[4]
    r1, r2, _ = simulate_reads(g, [allele], simulate_interval=5)
    res = type_reads(region, [(r.name, r.seq) for r in r1],
                     [(r.name, r.seq) for r in r2],
                     TypingOptions(family="genome", simulation=False))
    assert res.prob[0][0] == allele
    # flank-only region carries no variants
    flank = region_gene(out, "chrS", 0, 2000)
    assert flank.n_vars == 0


def _place_family(fam, cat, chrom="chrS"):
    for g, (left, right) in fam["loci"].items():
        if g in cat.genes:
            cat.genes[g].chrom = chrom
            cat.genes[g].chrom_left = left
            cat.genes[g].chrom_right = right


def test_clinvar_vcf_import(tmp_path):
    """ClinVar-style VCF variants splice into the genotype genome:
    renumbered into spliced coordinates, gene-overlapping rows dropped,
    .clnsig written, nearby variants grouped into haplotype windows
    (ref: build_genome.py:65-102, 205-290, 327-360)."""
    import gzip

    from hgtpu.db import build_catalog_from_msa
    from hgtpu.db.clinvar import read_vcf_variants
    from hgtpu.db.genome import build_genotype_genome, liftover

    fam = make_family(genes=("A",), n_alleles=8, length=1200, seed=77)
    cat = build_catalog_from_msa(
        "hla",
        {g: dict(names=s["names"], rows=s["rows"],
                 ref_allele=s["ref_allele"], exons=s["exons"])
         for g, s in fam["specs"].items()}, min_var_freq=0.0)
    _place_family(fam, cat)
    left, right = fam["loci"]["A"]
    genome = fam["genome"]

    # VCF: 1-based positions.  Two nearby SNVs upstream of the gene, a
    # deletion, an insertion, a multi-alt row, one inside the gene locus
    # (must be dropped), and one far downstream.
    vcf = "\n".join([
        "##fileformat=VCFv4.2",
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO",
        "chrS\t11\trs1\t%s\tG\t.\t.\tGENEINFO=GENE1:111;CLNSIG=Pathogenic"
        % genome[10],
        "chrS\t21\trs2\t%s\tT\t.\t.\tCLNSIG=Benign" % genome[20],
        "chrS\t61\trs3\t%sAA\t%s\t.\t.\t."
        % (genome[60], genome[60]),                       # 2bp deletion
        "chrS\t81\trs4\t%s\t%sTTT\t.\t.\t."
        % (genome[80], genome[80]),                       # 3bp insertion
        "chrS\t%d\trs5\t%s\tA\t.\t.\tCLNSIG=Pathogenic"
        % (left + 3, genome[left + 2]),                   # inside locus
        "chrS\t%d\trs6\t%s\tC,G\t.\t.\t."
        % (len(genome) - 9, genome[len(genome) - 10]),    # multi-alt
        "",
    ])
    vcf_path = str(tmp_path / "clinvar.vcf.gz")
    with gzip.open(vcf_path, "wt") as f:
        f.write(vcf)

    ext, clnsig = read_vcf_variants(vcf_path)
    assert [v[:3] for v in ext["chrS"][:4]] == [
        (10, "single", "G"), (20, "single", "T"),
        (61, "deletion", "2"), (81, "insertion", "TTT")]
    # deletion/insertion left = base after the VCF anchor (0-based 60+1)
    # the multi-alt row becomes two ids; one of C/G may equal the ref
    assert clnsig["rs1"] == ("GENE1", "Pathogenic")
    assert clnsig["rs2"] == ("-", "Benign")

    out = str(tmp_path / "gg" / "genotype_genome")
    spliced, offsets = build_genotype_genome(
        {"chrS": genome}, {"hla": cat}, out,
        external_vars=ext, clnsig=clnsig)

    rows = {l.split("\t")[0]: l.split("\t")
            for l in open(out + ".snp").read().splitlines()}
    assert "rs5" not in rows                # inside-locus variant dropped
    assert rows["rs1"][1:] == ["single", "chrS", "10", "G"]
    assert rows["rs3"][1:] == ["deletion", "chrS", "61", "2"]
    # downstream variant shifted by the backbone/locus length delta
    lift = liftover(out + ".coord")
    new_rs6 = int(rows["rs6"][3])
    assert lift("chrS", new_rs6) == len(genome) - 10

    sig_rows = dict((l.split("\t")[0], l.split("\t")[1:])
                    for l in open(out + ".clnsig").read().splitlines())
    assert sig_rows["rs1"] == ["GENE1", "Pathogenic"]
    assert "rs3" not in sig_rows            # no CLNSIG on rs3

    # rs1+rs2 (gap 10 <= 30) share a haplotype window; rs6 is alone
    ht_rows = [l.split("\t")
               for l in open(out + ".haplotype").read().splitlines()
               if ",".join(("rs1", "rs2")) in l or "rs6" in l]
    assert any(r[4] == "rs1,rs2" for r in ht_rows)


def test_ucsc_common_import(tmp_path):
    """UCSC snpNNNCommon.txt dbSNP table parses into variant tuples with
    chr-prefix stripping (ref build_genome.py:107-142)."""
    from hgtpu.db.clinvar import read_ucsc_common

    cols12 = lambda *c: "\t".join(map(str, c))
    txt = "\n".join([
        cols12(585, "chr1", 100, 101, "rs10", 0, "+", "A", "A", "A/G",
               "genomic", "single"),
        cols12(585, "chr1", 200, 203, "rs11", 0, "+", "TTT", "TTT", "-/TTT",
               "genomic", "deletion"),
        cols12(585, "chrM", 50, 50, "rs12", 0, "+", "-", "-", "-/CC",
               "genomic", "insertion"),
        cols12(585, "chr1", 300, 301, "rs13", 0, "+", "C", "C", "C/T/G",
               "genomic", "single"),
        "",
    ])
    p = str(tmp_path / "snp144Common.txt")
    open(p, "w").write(txt)
    vars_ = read_ucsc_common(p)
    assert vars_["1"][0] == (100, "single", "G", "rs10")
    assert vars_["1"][1] == (200, "deletion", "3", "rs11")
    assert vars_["MT"][0] == (50, "insertion", "CC", "rs12")
    # multi-alt single expands with .N suffixes
    assert {(v[0], v[2]) for v in vars_["1"][2:]} == {(300, "T"), (300, "G")}
    assert {v[3] for v in vars_["1"][2:]} == {"rs13", "rs13.1"}


def test_db_fetch_hook(generef, tmp_path, monkeypatch):
    """clone_hisatgenotype_database acquires through a pluggable source
    (local mirror dir / $HGTPU_DB_SOURCE / callable) instead of hard
    network egress (typing_common.py:526-529)."""
    from hgtpu.db import manage

    spec, ref = generef
    mirror = str(tmp_path / "mirror")
    os.makedirs(mirror)
    export_text(Catalog(family="hla", genes={"A": ref}), mirror + "/hla")

    # directory source
    d1 = str(tmp_path / "ix1")
    manage.clone_hisatgenotype_database(d1, source=mirror)
    assert manage.database_exists(d1, "hla")

    # env source
    d2 = str(tmp_path / "ix2")
    monkeypatch.setenv("HGTPU_DB_SOURCE", mirror)
    manage.clone_hisatgenotype_database(d2)
    assert manage.database_exists(d2, "hla")
    monkeypatch.delenv("HGTPU_DB_SOURCE")

    # callable source
    d3 = str(tmp_path / "ix3")
    called = []
    manage.download_genome_and_index(d3, source=lambda p: called.append(p))
    assert called == [d3]

    # no source still raises with instructions
    with pytest.raises(RuntimeError):
        manage.clone_hisatgenotype_database(str(tmp_path / "ix4"))
