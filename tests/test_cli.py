"""CLI tests: database on disk -> simulation/real-read runs through the
`python -m hgtpu` surface (the reference's devel test command shapes)."""
import os
import subprocess
import sys

import pytest

from hgtpu.db import build_gene_ref, Catalog
from hgtpu.db.catalog import export_text
from hgtpu.sim import simulate_reads
from tests.synth import make_gene_msa

ENV = dict(os.environ, JAX_PLATFORMS="cpu")


@pytest.fixture(scope="module")
def dbdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("db")
    spec = make_gene_msa(seed=11, n_alleles=20, length=1500)
    ref, _ = build_gene_ref(
        "A", spec["names"], spec["rows"], spec["ref_allele"],
        exons_ref_coords=spec["exons"],
        primary_exon_idx=spec["primary_exon_idx"], min_var_freq=0.0)
    export_text(Catalog(family="hla", genes={"A": ref}), str(d / "hla"))
    return d, ref


def _run(args, cwd):
    return subprocess.run(
        [sys.executable, "-m", "hgtpu"] + args,
        capture_output=True, text=True, cwd=cwd, env=ENV, timeout=600)


def test_cli_simulation(dbdir, tmp_path):
    d, ref = dbdir
    out = tmp_path / "out"
    r = _run(["--base", "hla", "--ix-dir", str(d), "--locus-list", "A",
              "--debug", "basic,test_size:2,set_seed:101",
              "--simulate-interval", "5", "--out-dir", str(out)],
             cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Passed so far: 2/2" in r.stderr
    reports = sorted(os.listdir(out))
    assert reports == ["assembly_graph-hla.test-1.report",
                       "assembly_graph-hla.test-2.report"]
    text = open(out / reports[0]).read()
    assert "*** 1 ranked" in text and "(abundance: 100.00%)" in text


def test_cli_real_reads(dbdir, tmp_path):
    d, ref = dbdir
    allele = ref.allele_names[6]
    r1, r2, _ = simulate_reads(ref, [allele], simulate_interval=4)
    f1, f2 = tmp_path / "s.1.fq", tmp_path / "s.2.fq"
    from hgtpu.utils.io import write_fastq
    write_fastq([(x.name.replace(" ", "_"), x.seq) for x in r1], str(f1))
    write_fastq([(x.name.replace(" ", "_"), x.seq) for x in r2], str(f2))
    out = tmp_path / "out2"
    r = _run(["--base", "hla", "--ix-dir", str(d),
              "-1", str(f1), "-2", str(f2), "--out-dir", str(out)],
             cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-2000:]
    report = open(out / "assembly_graph-hla.s.report").read()
    assert ("1 %s (count:" % allele) in report
    assert ("1 ranked %s (abundance:" % allele) in report


def test_toolkit_parse_results(dbdir, tmp_path):
    d, ref = dbdir
    out = tmp_path / "out3"
    _run(["--base", "hla", "--ix-dir", str(d), "--locus-list", "A",
          "--debug", "basic,test_size:1,set_seed:7",
          "--simulate-interval", "5", "--out-dir", str(out)],
         cwd="/root/repo")
    r = subprocess.run(
        [sys.executable, "-m", "hgtpu.cli.toolkit", "parse-results",
         "--in-dir", str(out), "--csv", str(tmp_path / "calls.csv")],
        capture_output=True, text=True, cwd="/root/repo", env=ENV,
        timeout=300)
    assert r.returncode == 0, r.stderr
    assert "A*" in r.stdout
    assert open(tmp_path / "calls.csv").read().startswith(
        "sample,gene,allele1,allele2")


def test_cli_multigene_and_codis(tmp_path):
    """Multi-gene family DB through the CLI plus a codis-family run."""
    import random

    from hgtpu.db import build_catalog_from_msa, build_gene_ref
    from hgtpu.db.catalog import export_text, Catalog
    from hgtpu.tools.codis import codis_msa
    from tests.synth import make_family

    d = tmp_path / "db"
    d.mkdir()
    fam = make_family(genes=("A", "B"), n_alleles=10, length=1000, seed=41)
    cat = build_catalog_from_msa(
        "hla",
        {g: dict(names=s["names"], rows=s["rows"],
                 ref_allele=s["ref_allele"], exons=s["exons"])
         for g, s in fam["specs"].items()}, min_var_freq=0.0)
    export_text(cat, str(d / "hla"))
    r = _run(["--base", "hla", "--ix-dir", str(d), "--locus-list", "A,B",
              "--debug", "basic,test_size:1,set_seed:5",
              "--simulate-interval", "6", "--out-dir", str(tmp_path / "o")],
             cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-1500:]
    assert "Passed so far: 2/2" in r.stderr

    # codis family
    rng = random.Random(5)
    f5 = "".join(rng.choice("ACGT") for _ in range(350))
    f3 = "".join(rng.choice("ACGT") for _ in range(350))
    names, rows = codis_msa(
        [("D3S1358*14", "[TCTA]14"), ("D3S1358*15", "[TCTA]15"),
         ("D3S1358*16", "[TCTA]16"), ("D3S1358*17", "[TCTA]17")], f5, f3)
    ref, _ = build_gene_ref("D3S1358", names, rows, names[0],
                            min_var_freq=0.0, collapse=False,
                            leftshift=False)
    export_text(Catalog(family="codis", genes={"D3S1358": ref}),
                str(d / "codis"))
    r = _run(["--base", "codis", "--ix-dir", str(d),
              "--debug", "basic,test_size:1,set_seed:3",
              "--simulate-interval", "6",
              "--out-dir", str(tmp_path / "o2")], cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-1500:]
    assert "Passed so far: 1/1" in r.stderr


def _tk(args, cwd="/root/repo"):
    return subprocess.run(
        [sys.executable, "-m", "hgtpu.cli.toolkit"] + args,
        capture_output=True, text=True, cwd=cwd, env=ENV, timeout=600)


def test_cli_linear_aligner(dbdir, tmp_path):
    """--aligner bowtie2 routes typing through the linear-index path."""
    d, ref = dbdir
    allele = ref.allele_names[9]
    r1, r2, _ = simulate_reads(ref, [allele], simulate_interval=5)
    from hgtpu.utils.io import write_fastq
    f1, f2 = tmp_path / "l.1.fq", tmp_path / "l.2.fq"
    write_fastq([(x.name.replace(" ", "_"), x.seq) for x in r1], str(f1))
    write_fastq([(x.name.replace(" ", "_"), x.seq) for x in r2], str(f2))
    out = tmp_path / "out"
    r = _run(["--base", "hla", "--ix-dir", str(d), "--aligner", "bowtie2",
              "-1", str(f1), "-2", str(f2), "--out-dir", str(out)],
             cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-2000:]
    report = open(out / "assembly_graph-hla.l.report").read()
    assert ("1 ranked %s (abundance:" % allele) in report


def test_cli_only_locus_list(tmp_path):
    """--only-locus-list restricts typed genes (ref args.py:328-333)."""
    from hgtpu.db import build_catalog_from_msa
    from hgtpu.db.catalog import export_text
    from tests.synth import make_family

    d = tmp_path / "db"
    d.mkdir()
    fam = make_family(genes=("A", "B"), n_alleles=8, length=900, seed=13)
    cat = build_catalog_from_msa(
        "hla",
        {g: dict(names=s["names"], rows=s["rows"],
                 ref_allele=s["ref_allele"], exons=s["exons"])
         for g, s in fam["specs"].items()}, min_var_freq=0.0)
    export_text(cat, str(d / "hla"))
    out = tmp_path / "o"
    r = _run(["--base", "hla", "--ix-dir", str(d),
              "--only-locus-list", "B",
              "--debug", "basic,test_size:1,set_seed:5",
              "--simulate-interval", "8", "--out-dir", str(out)],
             cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-1500:]
    assert "Passed so far: 1/1" in r.stderr
    report = open(out / sorted(os.listdir(out))[0]).read()
    assert "B*" in report and "A*" not in report


def test_toolkit_samples_platinum(dbdir, tmp_path):
    """`toolkit samples` types a directory of extracted samples and
    checks platinum-trio concordance (locus_samples.py:288-329)."""
    d, ref = dbdir
    from hgtpu.utils.io import write_fastq

    rd = tmp_path / "reads"
    rd.mkdir()
    mom, dad = ref.allele_names[2], ref.allele_names[5]
    child = [mom, dad]
    for sample, alleles in (("NA12878", child), ("NA12891", [mom, mom]),
                            ("NA12892", [dad, dad])):
        r1, r2, _ = simulate_reads(ref, alleles, simulate_interval=6)
        write_fastq([(x.name.replace(" ", "_"), x.seq) for x in r1],
                    str(rd / ("%s.extracted.1.fq.gz" % sample)))
        write_fastq([(x.name.replace(" ", "_"), x.seq) for x in r2],
                    str(rd / ("%s.extracted.2.fq.gz" % sample)))
    r = _tk(["samples", "--base", "hla", "--ix-dir", str(d),
             "--read-dir", str(rd), "--platinum-check", "--pp", "2"])
    assert r.returncode == 0, r.stderr[-2000:] + r.stdout[-500:]
    assert "platinum-check A: concordant" in r.stdout
    assert "NA12878\tA\t" in r.stdout


def test_toolkit_hla_cyp_novel_detection(dbdir, tmp_path):
    """`toolkit hla-cyp --novel_allele_detection` excludes alleles and
    reports sensitivity/specificity of novel flagging."""
    d, ref = dbdir
    r = _tk(["hla-cyp", "--base", "hla", "--ix-dir", str(d),
             "--novel_allele_detection", "--exclude-allele-list", "2",
             "--simulate-interval", "8", "--random-seed", "4"])
    assert r.returncode == 0, r.stderr[-2000:] + r.stdout[-500:]
    assert "novel-allele sensitivity" in r.stdout


def test_toolkit_hla_cyp_aligner_list(dbdir, tmp_path):
    """--aligner-list runs each aligner variant over the test alleles."""
    d, ref = dbdir
    a = ref.allele_names[4]
    r = _tk(["hla-cyp", "--base", "hla", "--ix-dir", str(d),
             "--allele-list", a, "--simulate-interval", "6",
             "--aligner-list", "hisat2.graph,bowtie2.linear"])
    assert r.returncode == 0, r.stderr[-2000:] + r.stdout[-500:]
    assert r.stdout.count("PASS") == 2


def test_toolkit_convert_codis_min_freq(tmp_path):
    """`toolkit convert-codis` builds a typable DB from a .dat table and
    --min-freq drops rare alleles (convert_codis.py:413-466)."""
    import random

    rng = random.Random(7)
    f5 = "".join(rng.choice("ACGT") for _ in range(300))
    f3 = "".join(rng.choice("ACGT") for _ in range(300))
    dat = tmp_path / "codis.dat"
    dat.write_text("".join(
        "D3S1358\t%d\t[TCTA]%d\n" % (n, n) for n in (14, 15, 16, 17)))
    freqs = tmp_path / "freq.tsv"
    freqs.write_text("D3S1358\t14\t0.10\nD3S1358\t15\t0.30\n"
                     "D3S1358\t16\t0.005\nD3S1358\t17\t0.20\n")
    d = tmp_path / "db"
    d.mkdir()
    r = _tk(["convert-codis", "--base", "codis", "--ix-dir", str(d),
             "--dat", str(dat), "--freq-table", str(freqs),
             "--min-freq", "0.01", "--flank5", f5, "--flank3", f3])
    assert r.returncode == 0, r.stderr[-2000:]
    from hgtpu.db.catalog import import_text
    cat = import_text("codis", str(d / "codis"))
    names = cat.genes["D3S1358"].allele_names
    assert "D3S1358*16" not in names
    assert {"D3S1358*14", "D3S1358*15", "D3S1358*17"} <= set(names)


def test_toolkit_extract_reads_dir_mode(dbdir, tmp_path):
    """extract-reads --read-dir scans samples, stripes by --job-range,
    and --extract-whole skips routing."""
    d, ref = dbdir
    from hgtpu.utils.io import write_fastq

    rd = tmp_path / "reads"
    rd.mkdir()
    for sample in ("s0", "s1", "s2"):
        r1, r2, _ = simulate_reads(ref, [ref.allele_names[1]],
                                   simulate_interval=40)
        write_fastq([(x.name.replace(" ", "_"), x.seq) for x in r1],
                    str(rd / ("%s-1.fq.gz" % sample)))
        write_fastq([(x.name.replace(" ", "_"), x.seq) for x in r2],
                    str(rd / ("%s-2.fq.gz" % sample)))
    out = tmp_path / "o"
    out.mkdir()
    # stripe offset 1, stride 2 -> s1 only; extract-whole: no routing
    r = _tk(["extract-reads", "--database-list", "hla", "--ix-dir", str(d),
             "--read-dir", str(rd), "--job-range", "1,2",
             "--extract-whole", "--out-dir", str(out)])
    assert r.returncode == 0, r.stderr[-2000:]
    files = sorted(os.listdir(out))
    assert "s1-hla-extracted-1.fq.gz" in files
    assert not any(f.startswith(("s0", "s2")) for f in files)


def test_toolkit_extract_rbg_end_to_end(tmp_path):
    """`toolkit extract-rbg`: GenBank flat file -> typable DB -> the CLI
    ranks a simulated allele #1 (component #24 end-to-end)."""
    import random

    from tests.test_tools import _genbank_record

    rng = random.Random(21)
    seq = "".join(rng.choice("ACGT") for _ in range(1200))
    exons = [(41, 400), (501, 1100)]
    recs = [_genbank_record("RB%03d" % k, "GYPB", s, exons)
            for k, s in enumerate(_rbg_variants(seq, rng))]
    gb = tmp_path / "gypb.gb"
    gb.write_text("\n".join(recs) + "\n")
    d = tmp_path / "db"
    d.mkdir()
    r = _tk(["extract-rbg", "--base", "rbg", "--ix-dir", str(d),
             "--genbank", str(gb)])
    assert r.returncode == 0, r.stderr[-2000:]

    from hgtpu.db.catalog import import_text
    cat = import_text("rbg", str(d / "rbg"))
    ref = cat.genes["GYPB"]
    assert ref.n_alleles == 3 and ref.n_vars >= 4
    allele = ref.allele_names[1]
    r1, r2, _ = simulate_reads(ref, [allele], simulate_interval=5)
    from hgtpu.utils.io import write_fastq
    f1, f2 = tmp_path / "r.1.fq", tmp_path / "r.2.fq"
    write_fastq([(x.name.replace(" ", "_"), x.seq) for x in r1], str(f1))
    write_fastq([(x.name.replace(" ", "_"), x.seq) for x in r2], str(f2))
    out = tmp_path / "o"
    r = _run(["--base", "rbg", "--ix-dir", str(d), "-1", str(f1),
              "-2", str(f2), "--out-dir", str(out)], cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-2000:]
    rep = open(out / "assembly_graph-rbg.r.report").read()
    assert ("1 ranked %s (abundance:" % allele) in rep


def _rbg_variants(seq, rng):
    """Reference sequence + two alleles with scattered SNPs."""
    out = [seq]
    for k in (1, 2):
        s = list(seq)
        for p in rng.sample(range(30, len(seq) - 30), 3 + k):
            s[p] = "ACGT"[("ACGT".index(s[p]) + k) % 4]
        out.append("".join(s))
    return out


def test_toolkit_extract_reads_genome_mode(tmp_path):
    """extract-reads -x routes by spliced genotype-genome placement;
    --extract-whole bins uniquely-placed reads into 20-Mbp block files
    (typing_process.py:1534-1594)."""
    from hgtpu.db import build_catalog_from_msa
    from hgtpu.db.catalog import export_text
    from hgtpu.db.genome import build_genotype_genome
    from hgtpu.utils.io import write_fastq
    from tests.synth import make_family

    d = tmp_path / "db"
    d.mkdir()
    fam = make_family(genes=("A",), n_alleles=8, length=1200, seed=61)
    cat = build_catalog_from_msa(
        "hla",
        {g: dict(names=s["names"], rows=s["rows"],
                 ref_allele=s["ref_allele"], exons=s["exons"])
         for g, s in fam["specs"].items()}, min_var_freq=0.0)
    for g, (left, right) in fam["loci"].items():
        cat.genes[g].chrom = "chrS"
        cat.genes[g].chrom_left = left
        cat.genes[g].chrom_right = right
    export_text(cat, str(d / "hla"))
    gg = str(d / "gg")
    build_genotype_genome({"chrS": fam["genome"]}, {"hla": cat}, gg)

    ref = cat.genes["A"]
    allele = ref.allele_names[2]
    r1, r2, _ = simulate_reads(ref, [allele], simulate_interval=30)
    # plus unique flanking-genome reads (must NOT route to the family)
    flank = [("bg%d" % i, fam["genome"][i * 97:i * 97 + 100])
             for i in range(5)]
    f1, f2 = tmp_path / "g.1.fq", tmp_path / "g.2.fq"
    write_fastq([(x.name.replace(" ", "_"), x.seq) for x in r1] + flank,
                str(f1))
    write_fastq([(x.name.replace(" ", "_"), x.seq) for x in r2] + flank,
                str(f2))
    out = tmp_path / "o"
    out.mkdir()
    r = _tk(["extract-reads", "--database-list", "hla", "--ix-dir", str(d),
             "-x", gg, "-1", str(f1), "-2", str(f2),
             "--out-dir", str(out)])
    assert r.returncode == 0, r.stderr[-2000:]
    got = open(out / "g-hla-extracted-1.fq.gz", "rb")
    import gzip
    names = [l.strip()[1:].decode() for l in gzip.open(got)
             if l.startswith(b"@")]
    assert len(names) >= len(r1) * 0.9
    assert not any(n.startswith("bg") for n in names)

    # whole-genome block binning
    out2 = tmp_path / "o2"
    out2.mkdir()
    r = _tk(["extract-reads", "--database-list", "hla", "--ix-dir", str(d),
             "-x", gg, "-1", str(f1), "-2", str(f2), "--extract-whole",
             "--out-dir", str(out2)])
    assert r.returncode == 0, r.stderr[-2000:]
    files = sorted(os.listdir(out2))
    assert any("-chrS-0_20M-extracted-1.fq.gz" in f for f in files)
