"""Tool converters: CODIS STR tables, CYP/RBG star-allele tables -> MSA
-> typed databases (components #22-#24)."""
import random

import pytest

from hgtpu.db import build_gene_ref
from hgtpu.pipeline import type_reads
from hgtpu.sim import simulate_reads
from hgtpu.tools.codis import codis_msa, parse_structure
from hgtpu.tools.starallele import msa_from_variant_table, parse_events
from hgtpu.typer.engine import TypingOptions


def test_parse_structure():
    assert parse_structure("[TCTA]3 TCA [TCTG]2") == \
        [("TCTA", 3), ("TCA", 1), ("TCTG", 2)]


def _flanks(seed, n=400):
    rng = random.Random(seed)
    return ("".join(rng.choice("ACGT") for _ in range(n)),
            "".join(rng.choice("ACGT") for _ in range(n)))


def test_codis_end_to_end():
    f5, f3 = _flanks(5)
    table = [
        ("D18S51*10", "[AGAA]10"),
        ("D18S51*12", "[AGAA]12"),
        ("D18S51*13", "[AGAA]13"),
        ("D18S51*14.2", "[AGAA]13 GA [AGAA]1"),
        ("D18S51*16", "[AGAA]16"),
    ]
    names, rows = codis_msa(table, f5, f3)
    assert len({len(r) for r in rows}) == 1  # aligned
    ref, _ = build_gene_ref("D18S51", names, rows, names[0],
                            min_var_freq=0.0, collapse=False,
                            leftshift=False)
    # reconstruction: each allele equals flanks + its expanded repeats
    for (name, struct), row in zip(table, rows):
        expect = f5 + "".join(u * c for u, c in parse_structure(struct)) + f3
        assert ref.allele_seq(name) == expect, name
    # typing a simulated STR sample picks the right repeat count
    allele = "D18S51*13"
    r1, r2, _ = simulate_reads(ref, [allele], simulate_interval=2,
                               frag_len=300)
    res = type_reads(ref, [(r.name, r.seq) for r in r1],
                     [(r.name, r.seq) for r in r2],
                     TypingOptions(family="codis", simulation=True))
    assert res.prob[0][0] == allele, res.prob[:4]


def test_star_allele_conversion():
    rng = random.Random(8)
    refseq = "".join(rng.choice("ACGT") for _ in range(1200))
    events = {
        "CYP2D6*1": [],
        "CYP2D6*2": parse_events("%d%s>%s" % (
            100, refseq[100], "A" if refseq[100] != "A" else "C")),
        "CYP2D6*3": parse_events("500del2"),
        "CYP2D6*4": parse_events("700ins" + "GT"),
    }
    names, rows = msa_from_variant_table(refseq, events)
    assert len({len(r) for r in rows}) == 1
    ref, _ = build_gene_ref("CYP2D6", names, rows, "CYP2D6*1",
                            min_var_freq=0.0, collapse=False)
    assert ref.allele_seq("CYP2D6*1") == refseq
    assert len(ref.allele_seq("CYP2D6*3")) == len(refseq) - 2
    assert len(ref.allele_seq("CYP2D6*4")) == len(refseq) + 2
    # NT validation catches wrong reference base
    with pytest.raises(AssertionError):
        msa_from_variant_table(refseq, {"X*1": [("S", 10, "A" if
                                                 refseq[10] != "A" else "C",
                                                 "G")]})


def test_batch_runner_and_trio(tmp_path):
    from hgtpu.db import Catalog
    from hgtpu.db.catalog import export_text
    from hgtpu.tools.batch import (find_samples, run_batch, trio_concordant,
                                   top_two)
    from hgtpu.utils.io import write_fastq
    from tests.synth import make_gene_msa

    spec = make_gene_msa(seed=11, n_alleles=16, length=1200)
    ref, _ = build_gene_ref("A", spec["names"], spec["rows"],
                            spec["ref_allele"], min_var_freq=0.0)
    cat = Catalog(family="hla", genes={"A": ref})
    # two samples
    d = tmp_path / "reads"
    d.mkdir()
    truth = {}
    for i, allele_i in enumerate((3, 9)):
        allele = ref.allele_names[allele_i]
        truth["NA%05d" % i] = allele
        r1, r2, _ = simulate_reads(ref, [allele], simulate_interval=6)
        write_fastq([(r.name, r.seq) for r in r1],
                    str(d / ("NA%05d.extracted.1.fq.gz" % i)))
        write_fastq([(r.name, r.seq) for r in r2],
                    str(d / ("NA%05d.extracted.2.fq.gz" % i)))
    samples = find_samples(str(d), suffix="extracted.1.fq.gz")
    assert set(samples) == set(truth)
    calls = run_batch(cat, samples, threads=2)
    for sample, genes in calls.items():
        assert genes["A"][0][0] == truth[sample]
    # trio logic
    m = [["A*01", 0.5], ["A*02", 0.5]]
    f = [["A*03", 0.5], ["A*04", 0.5]]
    child_ok = [["A*01", 0.5], ["A*03", 0.5]]
    child_bad = [["A*05", 0.5], ["A*06", 0.5]]
    assert trio_concordant(child_ok, m, f)
    assert not trio_concordant(child_bad, m, f)
    assert top_two([["A*01", 0.99]]) == ["A*01", "A*01"]


def test_variant_caller(tmp_path):
    from hgtpu.tools.call_variants import call_variants, write_vcf
    from tests.synth import make_gene_msa

    spec = make_gene_msa(seed=11, n_alleles=16, length=1200)
    ref, _ = build_gene_ref("A", spec["names"], spec["rows"],
                            spec["ref_allele"], min_var_freq=0.0)
    allele = ref.allele_names[5]
    r1, r2, _ = simulate_reads(ref, [allele], simulate_interval=4)
    res = type_reads(ref, [(r.name, r.seq) for r in r1],
                     [(r.name, r.seq) for r in r2])
    recs = call_variants(ref, res)
    # every variant of the called allele appears, homozygous
    n_vars = len(ref.allele_var_indices(allele))
    assert len(recs) == n_vars
    assert all(gt == "1/1" for *_x, gt in recs)
    path = str(tmp_path / "out.vcf")
    write_vcf(path, ref, recs)
    text = open(path).read()
    assert text.startswith("##fileformat=VCFv4.2")
    assert text.count("\nA*BACKBONE\t") == n_vars


def test_legacy_pipeline():
    from hgtpu.db import Catalog
    from hgtpu.tools.legacy import perform_genotyping
    from tests.synth import make_gene_msa

    spec = make_gene_msa(seed=11, n_alleles=12, length=1100)
    ref, _ = build_gene_ref("A", spec["names"], spec["rows"],
                            spec["ref_allele"], min_var_freq=0.0)
    cat = Catalog(family="hla", genes={"A": ref})
    allele = ref.allele_names[3]
    r1, r2, _ = simulate_reads(ref, [allele], simulate_interval=5)
    out = perform_genotyping({"hla": cat},
                             [(r.name, r.seq) for r in r1],
                             [(r.name, r.seq) for r in r2])
    assert out["hla"]["A"].prob[0][0] == allele


def test_strbase_html_fetch(tmp_path):
    # component #25: STRBase page scraping (extract_codis_data.py:61-141)
    from hgtpu.tools.codis_fetch import (extract_codis_data,
                                         parse_strbase_html, dir_source,
                                         read_codis_dat)
    html = """
    <html><body><table>
    <tr><th>Allele</th><th width="35%">Repeat Structure</th></tr>
    <tr><td align="center"><font size="4">9 </font></td>
        <td><font size="2">[AGAA]<sub>9</sub></font> </td></tr>
    <tr><td>commentary row with no structure</td><td>see note</td></tr>
    <tr><td><font>14.2&nbsp;</font></td>
        <td>[AGAA]<sub>13</sub> GA&nbsp;[AGAA]<sub>1</sub></td></tr>
    <tr><td>22&quot;</td><td>[TCTA]<sub>11</sub>[TCTG]<sub>11</sub></td></tr>
    </table></body></html>
    """
    alleles = parse_strbase_html(html)
    assert alleles == [
        ("9", "[AGAA]9"),
        ("14.2", "[AGAA]13 GA[AGAA]1"),
        ("22''", "[TCTA]11[TCTG]11"),
    ]
    d = tmp_path / "pages"
    d.mkdir()
    (d / "str_D18S51.htm").write_text(html)
    out = tmp_path / "codis.dat"
    n = extract_codis_data(str(out), dir_source(str(d)), ["D18S51", "FGA"])
    assert n == 3  # FGA page missing -> skipped, not fatal
    table = read_codis_dat(str(out))
    assert list(table) == ["D18S51"]
    # the scraped table feeds the converter (component #22) directly
    names, rows = codis_msa([("D18S51*" + a, s)
                             for a, s in table["D18S51"]], "ACGT", "TTAA")
    assert len({len(r) for r in rows}) == 1


def test_codis_microvariant_truth_100pct():
    # junction reads of a microvariant allele (x.2) have four equal-cost
    # STR spellings; deletion-aware pair-gap selection (choose_pairs with
    # gene) must keep the true frame, where the reference's raw backbone
    # distances pick wrong frames (typing_core.py:680-716)
    f5, f3 = _flanks(7, 350)
    table = [
        ("D18S51*10", "[AGAA]10"),
        ("D18S51*13", "[AGAA]13"),
        ("D18S51*14.2", "[AGAA]13 GA [AGAA]1"),
        ("D18S51*16", "[AGAA]16"),
    ]
    names, rows = codis_msa(table, f5, f3)
    ref, _ = build_gene_ref("D18S51", names, rows, names[0],
                            min_var_freq=0.0, collapse=False,
                            leftshift=False)
    for allele in ref.allele_names:
        r1, r2, _ = simulate_reads(ref, [allele], simulate_interval=2,
                                   frag_len=300)
        res = type_reads(ref, [(r.name, r.seq) for r in r1],
                         [(r.name, r.seq) for r in r2],
                         TypingOptions(family="codis", simulation=True))
        assert res.prob[0][0] == allele and res.prob[0][1] > 0.9999, \
            (allele, res.prob[:3])
