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
