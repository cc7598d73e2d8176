"""Observability: per-stage tracing, the date-stamped run log, and
per-gene failure isolation (ref: hisatgenotype:670-680 writes
`<date>_hisat-genotype.log` with per-job tracebacks and the run
continues; SURVEY.md §5 metrics/logging)."""
import os

import pytest

from hgtpu.db import build_catalog_from_msa
from hgtpu.pipeline import simulation_sweep, type_family
from hgtpu.utils.runlog import RunLog
from hgtpu.utils.trace import TRACE
from tests.synth import make_family


@pytest.fixture(scope="module")
def catalog():
    fam = make_family(genes=("A", "B"), n_alleles=12, length=1200)
    return build_catalog_from_msa(
        "hla",
        {g: dict(names=s["names"], rows=s["rows"],
                 ref_allele=s["ref_allele"], exons=s["exons"],
                 primary_exon_idx=s["primary_exon_idx"])
         for g, s in fam["specs"].items()},
        min_var_freq=0.0)


def test_trace_collects_typing_stages(catalog):
    TRACE.reset()
    ref = catalog.gene("A")
    n, _ = simulation_sweep(ref, test_size=1, seed=5, simulate_interval=8)
    assert n == 1
    summ = TRACE.summary()
    for stage in ("place.dispatch", "place.fetch", "type.pileup",
                  "type.read_hts", "type.em"):
        assert stage in summ, "missing stage %s in %s" % (stage, summ)
        assert summ[stage]["s"] >= 0.0
        assert summ[stage]["n"] >= 1
    assert TRACE.total("place") >= summ["place.fetch"]["s"]


def test_trace_report_renders(capsys):
    t = TRACE
    t.reset()
    t.add("x.a", 0.5)
    t.add("x.b", 0.25, n=3)
    import io
    buf = io.StringIO()
    t.report(file=buf)
    out = buf.getvalue()
    assert "x.a" in out and "x.b" in out and "66.7%" in out


def test_runlog_failed_gene_continues(tmp_path, catalog, monkeypatch):
    """A gene whose typing raises is logged with a traceback and mapped
    to None; the other gene still types."""
    import hgtpu.pipeline.genotype as G

    real_type_gene = G.type_gene

    def boom(gene, groups, opts):
        if gene.gene == "B":
            raise RuntimeError("synthetic per-gene failure")
        return real_type_gene(gene, groups, opts)

    monkeypatch.setattr(G, "type_gene", boom)
    from hgtpu.sim import simulate_reads
    refA = catalog.gene("A")
    allele = refA.allele_names[0]
    r1, r2, _ = simulate_reads(refA, [allele], simulate_interval=8)
    runlog = RunLog(str(tmp_path))
    results = type_family(catalog, [(r.name, r.seq) for r in r1],
                          [(r.name, r.seq) for r in r2],
                          locus_list=["A", "B"], runlog=runlog)
    assert results["B"] is None
    assert results["A"] is not None
    assert results["A"].prob[0][0] == allele
    assert os.path.exists(runlog.path)
    text = open(runlog.path).read()
    assert "> Base and Files:hla B" in text
    assert "synthetic per-gene failure" in text
    # without a runlog the exception propagates
    with pytest.raises(RuntimeError):
        type_family(catalog, [(r.name, r.seq) for r in r1],
                    [(r.name, r.seq) for r in r2], locus_list=["B"])


def test_verbose_level_flag():
    from hgtpu.cli.main import build_parser
    args = build_parser().parse_args(["--verbose-level", "2"])
    assert args.verbose_level == 2
    args = build_parser().parse_args([])
    assert args.verbose_level == 0
