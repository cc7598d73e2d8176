"""Pure-Python BAM I/O (hgtpu/utils/bam.py) — the in-process replacement
for the reference's samtools view/index process boundary
(hisatgenotype:114-241)."""
import dataclasses
import gzip
import os

import pytest

from synth import make_gene_msa

from hgtpu.db import build_gene_ref
from hgtpu.db.catalog import Catalog, export_text
from hgtpu.sim import simulate_reads
from hgtpu.utils.bam import (BgzfWriter, read_bam, reads_from_bam,
                             write_bam)
from hgtpu.utils.dna import revcomp


def _recs():
    return [
        {"name": "r1", "flag": 99, "rname": "chr6", "pos": 100, "mapq": 60,
         "cigar": [("M", 8)], "rnext": "chr6", "pnext": 300, "tlen": 208,
         "seq": "ACGTACGT", "qual": "IIIIIIII",
         "tags": {"NH": ("i", 1), "MD": ("Z", "8"), "AS": ("i", 0)}},
        {"name": "r1", "flag": 147, "rname": "chr6", "pos": 300, "mapq": 60,
         "cigar": [("M", 4), ("S", 4)], "rnext": "chr6", "pnext": 100,
         "tlen": -208, "seq": "TTTTGGGG", "qual": "IIIIJJJJ",
         "tags": {"NH": ("i", 1)}},
        {"name": "r2", "flag": 0, "rname": "chrX", "pos": 50, "mapq": 1,
         "cigar": [("M", 3), ("D", 2), ("M", 3)], "rnext": "*",
         "pnext": -1, "tlen": 0, "seq": "AACCGG", "qual": "ABCDEF",
         "tags": {"NH": ("i", 3)}},
    ]


def test_bam_round_trip(tmp_path):
    path = str(tmp_path / "t.bam")
    refs = [("chr6", 1000), ("chrX", 500)]
    write_bam(path, refs, _recs(), header_text="@HD\tVN:1.6\n")
    back = list(read_bam(path))
    assert len(back) == 3
    for orig, got in zip(_recs(), back):
        for key in ("name", "flag", "rname", "pos", "mapq", "cigar",
                    "rnext", "pnext", "tlen", "seq", "qual"):
            assert got[key] == orig[key], key
        for tag, tv in orig["tags"].items():
            assert got["tags"][tag] == tv, tag


def test_bam_region_filter(tmp_path):
    path = str(tmp_path / "t.bam")
    write_bam(path, [("chr6", 1000), ("chrX", 500)], _recs())
    # r1 mate1 spans [100,108): overlaps 105-200, not 300-310
    assert [r["name"] for r in read_bam(path, ("chr6", 105, 200))] == ["r1"]
    got = [r["pos"] for r in read_bam(path, ("chr6", 290, 310))]
    assert got == [300]
    assert [r["name"] for r in read_bam(path, ("chrX", 0, 99))] == ["r2"]
    assert list(read_bam(path, ("chrM", 0, 99))) == []


def test_bgzf_block_structure(tmp_path):
    # every block is an independent gzip member with the BC extra field
    path = str(tmp_path / "t.bgzf")
    with BgzfWriter(path) as w:
        w.write(b"x" * 200000)  # forces multiple blocks
    raw = open(path, "rb").read()
    assert raw[:4] == b"\x1f\x8b\x08\x04" and b"BC" in raw[:18]
    assert raw.endswith(bytes.fromhex(
        "1f8b08040000000000ff0600424302001b0003000000000000000000"))
    with gzip.open(path, "rb") as f:
        assert f.read() == b"x" * 200000


def test_reads_from_bam_semantics(tmp_path):
    path = str(tmp_path / "t.bam")
    recs = [
        # proper pair, NH==1, mate2 stored reverse-complemented
        {"name": "p", "flag": 0x1 | 0x40, "rname": "chr6", "pos": 100,
         "cigar": [("M", 4)], "seq": "ACGT", "qual": "IIII",
         "tags": {"NH": ("i", 1)}},
        {"name": "p", "flag": 0x1 | 0x80 | 0x10, "rname": "chr6",
         "pos": 150, "cigar": [("M", 4)], "seq": "AAGG", "qual": "HIJK",
         "tags": {"NH": ("i", 1)}},
        # multimapper group: dropped (no NH==1 record)
        {"name": "m", "flag": 0x1 | 0x40, "rname": "chr6", "pos": 120,
         "cigar": [("M", 4)], "seq": "CCCC", "qual": "IIII",
         "tags": {"NH": ("i", 2)}},
    ]
    write_bam(path, [("chr6", 1000)], recs)
    r1, r2 = reads_from_bam(path, "chr6", 0, 400)
    assert [n for n, _s, _q in r1] == ["p"]
    assert r1[0][1] == "ACGT"
    # the reverse-strand mate comes back in sequencer orientation
    assert r2[0][1] == revcomp("AAGG") and r2[0][2] == "KJIH"


@pytest.fixture(scope="module")
def placed_gene():
    spec = make_gene_msa(seed=31, n_alleles=12, length=1500)
    ref, _ = build_gene_ref(
        "A", spec["names"], spec["rows"], spec["ref_allele"],
        exons_ref_coords=spec["exons"],
        primary_exon_idx=spec["primary_exon_idx"], min_var_freq=0.0)
    return dataclasses.replace(
        ref, chrom="chr6", chrom_left=20000,
        chrom_right=20000 + len(ref.backbone) - 1)


def test_bamfile_cli_end_to_end(placed_gene, tmp_path):
    # simulate reads, write them as host-genome BAM records at the locus
    # placement, and run the --bamfile CLI flow (ref hisatgenotype:242-315)
    gene = placed_gene
    truth = gene.allele_names[4]
    r1, r2, _ = simulate_reads(gene, [truth], simulate_interval=3,
                               seed=3)
    recs = []
    for k, (a, b) in enumerate(zip(r1, r2)):
        pos = gene.chrom_left + (k * 3) % max(1, len(gene.backbone) - 250)
        recs.append({"name": "rd%d" % k, "flag": 0x1 | 0x40,
                     "rname": "chr6", "pos": pos,
                     "cigar": [("M", len(a.seq))], "seq": a.seq,
                     "qual": "I" * len(a.seq), "tags": {"NH": ("i", 1)}})
        # reverse-strand records carry the genome-orientation sequence;
        # extraction reverse-complements back to sequencer orientation
        recs.append({"name": "rd%d" % k, "flag": 0x1 | 0x80 | 0x10,
                     "rname": "chr6", "pos": pos + 150,
                     "cigar": [("M", len(b.seq))], "seq": revcomp(b.seq),
                     "qual": "I" * len(b.seq), "tags": {"NH": ("i", 1)}})
    bam = str(tmp_path / "sample.bam")
    write_bam(bam, [("chr6", 60000)], recs)

    db = tmp_path / "db"
    db.mkdir()
    export_text(Catalog(family="hla", genes={"A": gene}),
                str(db / "hla"))
    out = tmp_path / "out"
    from hgtpu.cli.main import main as cli_main
    rc = cli_main(["--base", "hla", "--ix-dir", str(db),
                   "--bamfile", bam, "--out-dir", str(out)])
    assert rc == 0
    report = [p for p in os.listdir(out) if p.endswith(".report")]
    assert report
    text = open(str(out / report[0])).read()
    assert ("1 ranked %s" % truth) in text


def test_region_list_cli(placed_gene, tmp_path):
    db = tmp_path / "db"
    db.mkdir()
    export_text(Catalog(family="hla", genes={"A": placed_gene}),
                str(db / "hla"))
    out = tmp_path / "out"
    from hgtpu.cli.main import main as cli_main
    rc = cli_main(["--region-list", "hla.A", "--ix-dir", str(db),
                   "--debug", "basic,test_size:1,set_seed:7",
                   "--out-dir", str(out)])
    assert rc == 0
