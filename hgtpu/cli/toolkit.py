"""Toolkit CLI — the `hisatgenotype_toolkit` equivalent
(ref: hisatgenotype_toolkit:37-103 dispatches subcommands by name).

Subcommands:
  extract-vars    build a database from MSF alignments
                  (ref: hisatgenotype_tools/hisatgenotype_extract_vars.py)
  extract-reads   route raw reads into per-family read files
                  (ref: .../hisatgenotype_extract_reads.py)
  locus           type one family from extracted reads
                  (ref: .../hisatgenotype_locus.py)
  parse-results   collapse .report files into final calls
                  (ref: .../hisatgenotype_parse_results.py)
"""
from __future__ import annotations

import argparse
import os
import sys

from . import args as A


def cmd_extract_vars(argv):
    p = argparse.ArgumentParser(prog="hgtpu extract-vars")
    A.args_common(p)
    A.args_databases(p)
    p.add_argument("--msf-dir", dest="msf_dir", required=True,
                   help="directory of <gene>_gen.msf files")
    p.add_argument("--min-var-freq", dest="min_var_freq", type=float,
                   default=0.1)
    p.add_argument("--inter-gap", type=int, default=30)
    p.add_argument("--intra-gap", type=int, default=50)
    p.add_argument("--whole-haplotype", action="store_true")
    p.add_argument("--leftshift", action="store_true", default=True)
    args = p.parse_args(argv)

    from ..db.build import build_gene_ref
    from ..db.catalog import Catalog, export_text
    from ..db.msf import read_msf

    genes = {}
    next_id = 0
    locus_list = [g for g in args.locus_list.split(",") if g]
    for fname in sorted(os.listdir(args.msf_dir)):
        if not fname.endswith("_gen.msf"):
            continue
        gene = fname[:-len("_gen.msf")]
        if locus_list and gene not in locus_list:
            continue
        names, rows = read_msf(os.path.join(args.msf_dir, fname))
        name_list = list(names.keys())
        ref, next_id = build_gene_ref(
            gene, name_list, rows, name_list[0],
            min_var_freq=args.min_var_freq, inter_gap=args.inter_gap,
            intra_gap=args.intra_gap, whole_haplotype=args.whole_haplotype,
            base_var_id=next_id)
        genes[gene] = ref
        print("%s: %d alleles, %d variants" % (gene, ref.n_alleles,
                                               ref.n_vars), file=sys.stderr)
    cat = Catalog(family=args.base_fname, genes=genes)
    export_text(cat, os.path.join(args.ix_dir, args.base_fname))
    print("Database written to %s/%s.*" % (args.ix_dir, args.base_fname),
          file=sys.stderr)
    return 0


def cmd_extract_reads(argv):
    p = argparse.ArgumentParser(prog="hgtpu extract-reads")
    A.args_common(p)
    A.args_input(p)
    p.add_argument("--database-list", dest="database_list", type=str,
                   default="hla")
    p.add_argument("--ix-dir", dest="ix_dir", type=str, default=".")
    p.add_argument("--suffix", type=str, default="fq.gz")
    args = p.parse_args(argv)

    from ..db.catalog import import_text
    from ..pipeline.extract import ReadExtractor
    from ..utils.io import read_fastx, write_fastq

    catalogs = {}
    for fam in args.database_list.split(","):
        catalogs[fam] = import_text(fam, os.path.join(args.ix_dir, fam))
    ex = ReadExtractor(catalogs)
    reads_1 = read_fastx(args.read_fname_1 or args.read_fname_U)
    reads_2 = read_fastx(args.read_fname_2) if args.read_fname_2 else None
    routed = ex.extract(reads_1, reads_2)
    base = os.path.basename(
        (args.read_fname_1 or args.read_fname_U)).split(".")[0]
    for fam, (r1, r2) in routed.items():
        out1 = os.path.join(args.out_dir, "%s-%s-extracted-1.%s"
                            % (base, fam, args.suffix))
        write_fastq(r1, out1)
        print("%s: %d reads -> %s" % (fam, len(r1), out1), file=sys.stderr)
        if r2:
            out2 = out1.replace("-extracted-1.", "-extracted-2.")
            write_fastq(r2, out2)
    return 0


def cmd_locus(argv):
    from .main import main as genotype_main
    return genotype_main(argv)


def cmd_parse_results(argv):
    p = argparse.ArgumentParser(prog="hgtpu parse-results")
    p.add_argument("--in-dir", dest="in_dir", type=str, default=".")
    p.add_argument("--csv", dest="csv", type=str, default="")
    args = p.parse_args(argv)

    from ..tools.results import parse_report_dir, to_csv

    calls = parse_report_dir(args.in_dir)
    if args.csv:
        to_csv(calls, args.csv)
    for sample, genes in sorted(calls.items()):
        for gene, alleles in sorted(genes.items()):
            print("%s\t%s\t%s" % (sample, gene, "\t".join(alleles)))
    return 0


def cmd_inspect(argv):
    p = argparse.ArgumentParser(prog="hgtpu inspect")
    p.add_argument("prefix", help="database prefix (e.g. DB/hla)")
    p.add_argument("-o", "--out", type=str, default="")
    args = p.parse_args(argv)
    from ..db.manage import inspect
    inspect(args.prefix, args.out or None)
    return 0


def cmd_build_genome(argv):
    p = argparse.ArgumentParser(prog="hgtpu build-genome")
    A.args_common(p)
    p.add_argument("--genome", required=True, help="host genome FASTA")
    p.add_argument("--database-list", dest="database_list", type=str,
                   default="hla")
    p.add_argument("--ix-dir", dest="ix_dir", type=str, default=".")
    p.add_argument("--out-prefix", dest="out_prefix", type=str,
                   default="genotype_genome")
    p.add_argument("--clinvar", dest="clinvar", type=str, default="",
                   help="ClinVar-style VCF(.gz) of external variants to "
                        "splice in (writes <out>.clnsig)")
    p.add_argument("--commonvar", dest="commonvar", type=str, default="",
                   help="UCSC snpNNNCommon.txt(.gz) dbSNP table to splice in")
    args = p.parse_args(argv)
    if args.clinvar and args.commonvar:
        # mutually exclusive, as in the reference (build_genome.py:554-556)
        print("Error: both --clinvar and --commonvar cannot be used "
              "together.", file=sys.stderr)
        return 1
    from ..db.catalog import import_text, _read_fasta
    from ..db.genome import build_genotype_genome
    external_vars, clnsig = None, None
    if args.clinvar:
        from ..db.clinvar import read_vcf_variants
        external_vars, clnsig = read_vcf_variants(args.clinvar)
    elif args.commonvar:
        from ..db.clinvar import read_ucsc_common
        external_vars = read_ucsc_common(args.commonvar)
    genome = _read_fasta(args.genome)
    catalogs = {fam: import_text(fam, os.path.join(args.ix_dir, fam))
                for fam in args.database_list.split(",")}
    build_genotype_genome(genome, catalogs,
                          os.path.join(args.out_dir, args.out_prefix),
                          external_vars=external_vars, clnsig=clnsig)
    print("genotype genome written to %s/%s.*"
          % (args.out_dir, args.out_prefix), file=sys.stderr)
    return 0


def cmd_extract_codis_data(argv):
    p = argparse.ArgumentParser(prog="hgtpu extract-codis-data")
    p.add_argument("--base", dest="base_fname", type=str, default="codis")
    p.add_argument("--locus-list", dest="locus_list", type=str, default="")
    p.add_argument("--html-dir", dest="html_dir", type=str, default="",
                   help="directory of saved STRBase str_<locus>.htm pages")
    p.add_argument("--download", action="store_true",
                   help="fetch pages over the network (needs egress)")
    p.add_argument("--verbose", action="store_true")
    args = p.parse_args(argv)

    from ..tools.codis_fetch import (dir_source, extract_codis_data,
                                     url_source)
    if args.html_dir:
        source = dir_source(args.html_dir)
    elif args.download:
        source = url_source()
    else:
        print("extract-codis-data: pass --html-dir DIR (offline pages) "
              "or --download", file=sys.stderr)
        return 1
    loci = [x for x in args.locus_list.split(",") if x]
    n = extract_codis_data(args.base_fname + ".dat", source, loci or None,
                           verbose=args.verbose)
    print("%d alleles -> %s.dat" % (n, args.base_fname), file=sys.stderr)
    return 0


COMMANDS = {
    "extract-vars": cmd_extract_vars,
    "extract-codis-data": cmd_extract_codis_data,
    "extract-reads": cmd_extract_reads,
    "locus": cmd_locus,
    "parse-results": cmd_parse_results,
    "inspect": cmd_inspect,
    "build-genome": cmd_build_genome,
}


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv or argv[0] in ("-h", "--help"):
        print("usage: python -m hgtpu.cli.toolkit <command> [options]\n"
              "commands: %s" % ", ".join(sorted(COMMANDS)))
        return 0
    cmd = argv[0]
    if cmd not in COMMANDS:
        print("unknown command: %s" % cmd, file=sys.stderr)
        return 1
    return COMMANDS[cmd](argv[1:])


if __name__ == "__main__":
    sys.exit(main())
