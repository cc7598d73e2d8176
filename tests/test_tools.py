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


def test_codis_repeat_aware_merge():
    """Repeat-aware block alignment (ref convert_codis.py:283-401):
    a block inserted mid-structure lands between its neighbours (not
    appended), and two distinct single-copy literals share one
    substitution column."""
    from hgtpu.tools.codis import codis_msa, merge_structures, \
        parse_structure

    table = [
        ("X*1", "[TCTA]4 [TCTG]3"),
        ("X*2", "[TCTA]4 TCA [TCTG]5"),     # TCA inserts mid-backbone
        ("X*3", "[TCTA]2 GTA [TCTG]3"),     # GTA subs into TCA's column
    ]
    backbone = merge_structures([parse_structure(s) for _, s in table])
    # exactly three columns: TCTA / {TCA,GTA} / TCTG
    assert [sorted(u) for u, _ in backbone] == \
        [["TCTA"], ["GTA", "TCA"], ["TCTG"]]
    assert [sorted(c) for _, c in backbone] == \
        [[2, 4], [0, 1], [3, 5]]

    names, rows = codis_msa(table)
    assert len({len(r) for r in rows}) == 1
    stripped = {n: r.replace(".", "") for n, r in zip(names, rows)}
    assert stripped["X*1"] == "TCTA" * 4 + "TCTG" * 3
    assert stripped["X*2"] == "TCTA" * 4 + "TCA" + "TCTG" * 5
    assert stripped["X*3"] == "TCTA" * 2 + "GTA" + "TCTG" * 3
    # per-column layout: the TCA/GTA substitution occupies the same span
    w_tcta = 4 * 4
    assert rows[1][w_tcta:w_tcta + 3] == "TCA"
    assert rows[2][w_tcta:w_tcta + 3] == "GTA"
    assert rows[0][w_tcta:w_tcta + 3] == "..."


def test_cyp_offset_sliding(tmp_path):
    """checkNTloc analog (extract_cyp_data.py:184-313): the converter
    discovers the cDNA->genomic offset by sliding, validates annotated
    reference bases, and renumbers promoter (negative) positions at
    offset+1."""
    import random

    from hgtpu.tools.starallele import convert_cyp_table, find_cyp_offset, \
        parse_cyp_events

    rng = random.Random(3)
    refseq = "".join(rng.choice("ACGT") for _ in range(400))
    true_off = 150      # cDNA +1 sits at genomic 151

    def base(p):        # annotated reference base for signed cDNA pos
        return refseq[p + (true_off if p > 0 else true_off + 1)]

    rows = [
        ("CYP9Z9*1", ""),
        ("CYP9Z9*2", "10%s>G;-30%s>T" % (base(10), base(-30))),
        ("CYP9Z9*3", "20_22del%s%s%s" % (base(20), base(21), base(22))),
        ("CYP9Z9*4", "40ins TTA".replace(" ", "")),
    ]
    events = {n: parse_cyp_events(s) for n, s in rows}
    op, on, fp, fn, ft = find_cyp_offset(refseq, events)
    assert (op, on) == (true_off, true_off + 1)
    assert fp == fn == ft == 1.0

    path = tmp_path / "cyp.tsv"
    path.write_text("".join("%s\t%s\n" % r for r in rows))
    names, msa = convert_cyp_table(str(path), refseq)
    by = dict(zip(names, msa))
    assert by["CYP9Z9*1"].replace(".", "") == refseq
    # the SNP landed at genomic 10+150
    assert by["CYP9Z9*2"].replace(".", "")[160] == "G"
    # deletion removed 3 bases
    assert len(by["CYP9Z9*3"].replace(".", "")) == len(refseq) - 3
    # insertion added 3
    assert len(by["CYP9Z9*4"].replace(".", "")) == len(refseq) + 3

    # scrambled annotations must fail NT validation
    bad = {"X*2": parse_cyp_events("10A>G;11A>G;12A>G;13A>G")}
    if all(refseq[10 + true_off + i] != "A" for i in range(4)):
        import pytest
        bad_path = tmp_path / "bad.tsv"
        bad_path.write_text("X*2\t10A>G;11A>G;12A>G;13A>G\n")
        with pytest.raises(ValueError):
            convert_cyp_table(str(bad_path), refseq)


def _genbank_record(acc, gene, seq, exons, mutate=None):
    """Minimal GenBank flat-file record in the shape get_seqbyRef
    consumes (extract_RBG.py:94-198): gene feature + /gene qualifier,
    a multi-line mRNA join(...), exon features with /number, ORIGIN."""
    gl, gr = 11, len(seq) - 10          # 1-based gene span
    joins = ",".join("%d..%d" % (l, r) for l, r in exons)
    head = [
        "LOCUS       %s             %d bp    DNA" % (acc, len(seq)),
        "FEATURES             Location/Qualifiers",
        "     source          1..%d" % len(seq),
        "     gene            %d..%d" % (gl, gr),
        '                     /gene="%s"' % gene,
        "     mRNA            join(%s," % joins.split(",")[0],
        "                     %s)" % ",".join(joins.split(",")[1:]),
        '                     /gene="%s"' % gene,
    ]
    for i, (l, r) in enumerate(exons):
        head.append("     exon            %d..%d" % (l, r))
        head.append('                     /number="%d"' % (i + 1))
    head.append("ORIGIN")
    for s in range(0, len(seq), 60):
        chunk = seq[s:s + 60].lower()
        head.append("%9d %s" % (
            s + 1, " ".join(chunk[k:k + 10] for k in range(0, len(chunk),
                                                           10))))
    return "\n".join(head) + "\n//"


def test_rbg_genbank_ingestion(tmp_path):
    """Multi-record GenBank flat files parse into per-allele gene slices
    and an MSA (extract_RBG.py:41-198, 266-436)."""
    import random

    from hgtpu.tools.rbg import convert_rbg_genbank, parse_record, \
        split_records

    rng = random.Random(9)
    seq = "".join(rng.choice("ACGT") for _ in range(360))
    exons = [(31, 90), (151, 240)]      # 1-based, inside the gene span
    rec1 = _genbank_record("RBG001", "GYPA", seq, exons)
    # allele 2: SNP at genomic 60 (0-based) and a 2bp deletion at 200
    alt = "G" if seq[60] != "G" else "T"
    seq2 = seq[:60] + alt + seq[61:200] + seq[202:]
    rec2 = _genbank_record("RBG002", "GYPA", seq2, exons)
    gb = tmp_path / "gypa.gb"
    gb.write_text(rec1 + "\n" + rec2 + "\n")

    recs = [parse_record(r) for r in split_records(gb.read_text())]
    assert [r["accession"] for r in recs] == ["RBG001", "RBG002"]
    assert recs[0]["seq"] == seq
    assert recs[0]["genes"]["GYPA"] == (10, 350)
    # exon numbers from /number, coordinates gene-relative
    assert recs[0]["exons"]["GYPA"] == [("1", 20, 80), ("2", 140, 230)]

    names, rows, ex = convert_rbg_genbank([str(gb)], "GYPA")
    assert names == ["GYPA*RBG001", "GYPA*RBG002"]
    assert len({len(r) for r in rows}) == 1
    assert rows[0].replace(".", "") == seq[10:350]
    assert rows[1].replace(".", "") == seq2[10:len(seq2) - 10]
    # the SNP column is aligned: genomic 60 -> gene-relative 50
    assert rows[0][50] == seq[60] and rows[1][50] == alt
    # the deletion shows as 2 gap positions in allele 2 (an equal-cost
    # alignment may split them), bases in the reference
    assert rows[1][180:205].count(".") == 2
    assert rows[0][180:205].count(".") == 0
    assert ex == [(20, 79), (140, 229)]


def test_choose_pairs_strict_parity_switch():
    """TypingOptions.strict_pair_distance reverts choose_pairs to the
    reference's raw-backbone gap measurement (typing_core.py:686-716):
    a catalog deletion inside the mate gap is only subtracted in the
    (default) allele-frame mode."""
    import numpy as np

    from hgtpu.db.catalog import GeneRef, VT_DELETION
    from hgtpu.typer.engine import choose_pairs

    gene = GeneRef(
        gene="D", backbone_name="D*BB", backbone="A" * 400,
        allele_names=["D*1"], var_ids=["hv0"],
        var_type=np.array([VT_DELETION], np.int8),
        var_pos=np.array([200], np.int32),
        var_len=np.array([50], np.int32),
        var_data=["50"],
        var_freq=np.array([50.0], np.float32),
        links=np.ones((1, 1), bool),
        exons=[(0, 399)], primary_exons=[(0, 399)], haplotypes=[])

    left = {"100-150"}
    right = {"300-350", "260-310"}
    # allele-frame (default): the deletion inside the 150..300 gap makes
    # the far mate the best fit (149-50=99 vs expected 100)
    l1, r1 = choose_pairs(set(left), set(right), 100, gene)
    assert r1 == {"300-350"}
    # strict reference mode (gene=None): raw gap picks the near mate
    l2, r2 = choose_pairs(set(left), set(right), 100, None)
    assert r2 == {"260-310"}


def test_compare_hla_concordance():
    """Offline compare_HLA harness (ref etc/compare_HLA.py:1-147):
    level collapsing, abundance merge, homozygous doubling, top-two vs
    any-rank tallies."""
    from hgtpu.tools.compare import compare_tables, format_report

    calls = [
        "s1\tA*01:01:01\t0.6",
        "s1\tA*02:05\t0.4",
        "s2\tA*03:01\t0.9",
        "s2\tA*11:01\t0.05",
        # s3: truth allele present but ranked 3rd (top-ten only)
        "s3\tA*24:02\t0.5",
        "s3\tA*29:01\t0.3",
        "s3\tA*26:08\t0.2",
    ]
    truth = [
        "s1\tA*01:01",          # homozygous truth: counts double
        "s2\tA*03:01",
        "s2\tA*11:01",
        "s3\tA*26:08",
        "s3\tA*24:02",
    ]
    res = compare_tables(calls, truth, levels=(1, 2), genes=("A",))
    gc2 = res[2]["A"]
    # s1 homozygous match in top2 -> bucket 2; s2 both matched -> 2;
    # s3 one in top2 (24:02) + one at rank 3 -> top2 bucket 1, top10 2
    assert gc2.top2 == [0, 1, 2]
    assert gc2.top10 == [0, 0, 3]
    assert abs(gc2.pct2 - (5 / 6) * 100) < 1e-9
    assert abs(gc2.pct10 - 100.0) < 1e-9
    # level 1 collapses 26:08 vs 26:xx the same way; report formats
    rep = format_report(res)
    assert "Level: 1" in rep and "Top two" in rep


def test_compare_hla_level_collapse_merges_abundance():
    from hgtpu.tools.compare import read_typing_table

    table = read_typing_table(
        ["s\tA*01:01:01\t0.30", "s\tA*01:01:02\t0.45", "s\tA*02:01\t0.25"],
        level=2)
    assert table["s"]["A"][0] == ["01:01", 0.75]
