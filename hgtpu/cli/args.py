"""Shared argument registry.

Mirror of the reference's composable argparse groups
(hisatgenotype_modules/hisatgenotype_args.py:33-469) so the devel test
command lines translate 1:1.
"""
from __future__ import annotations


def args_common(parser):
    parser.add_argument("-v", "--verbose", action="store_true")
    parser.add_argument("--verbose-level", dest="verbose_level", type=int,
                        default=0,
                        help="also print some statistics to stderr; >=2 "
                             "adds the per-stage timing table "
                             "(ref args.py:319-323)")
    parser.add_argument("--out-dir", dest="out_dir", type=str, default=".")


def args_databases(parser):
    parser.add_argument("--base", "--base-fname", dest="base_fname",
                        type=str, default="hla",
                        help="base filename of the family database")
    parser.add_argument("--region-list", dest="region_list", type=str,
                        default="",
                        help="comma-separated family.gene regions; "
                             "overrides --base/--locus-list "
                             "(ref args.py:366-371)")
    parser.add_argument("--locus-list", dest="locus_list", type=str,
                        default="", help="comma-separated gene list")
    parser.add_argument("--ix-dir", "--in-dir", dest="ix_dir", type=str,
                        default=".",
                        help="directory holding the database files")


def args_input(parser):
    parser.add_argument("-1", dest="read_fname_1", type=str, default="")
    parser.add_argument("-2", dest="read_fname_2", type=str, default="")
    parser.add_argument("-U", dest="read_fname_U", type=str, default="")
    parser.add_argument("-f", "--fasta", dest="fasta", action="store_true")
    parser.add_argument("--bamfile", dest="bamfile", type=str, default="",
                        help="coordinate BAM of host-genome alignments; "
                             "reads overlapping each locus are extracted "
                             "(ref hisatgenotype:114-241, args.py:170)")
    parser.add_argument("--alignment-file", dest="alignment_fname", type=str,
                        default="", help="type from an existing SAM file")


def args_aligner(parser):
    parser.add_argument("--num-editdist", dest="num_editdist", type=int,
                        default=2)
    parser.add_argument("-p", "--threads", dest="threads", type=int,
                        default=1)
    parser.add_argument("--no-error-correction", dest="error_correction",
                        action="store_false")
    parser.add_argument("--type-primary-exons", dest="type_primary_exons",
                        action="store_true",
                        help="EM stage on primary-exon representatives "
                             "first (ref args.py:338-341)")
    parser.add_argument("--keep-low-abundance-alleles",
                        dest="remove_low_abundance_alleles",
                        action="store_false",
                        help="do not prune low-abundance alleles during "
                             "EM (ref args.py:342-346)")
    parser.add_argument("--exclude-allele-list", dest="exclude_allele_list",
                        type=str, default="",
                        help="comma-separated alleles removed from the "
                             "panel before typing (ref args.py:388-393)")
    parser.add_argument("--discordant", dest="discordant",
                        action="store_true")
    parser.add_argument("--keep-alignment", dest="keep_alignment",
                        action="store_true")


def args_assembly(parser):
    parser.add_argument("--assembly", dest="assembly", action="store_true")
    parser.add_argument("--assembly-base", dest="assembly_base", type=str,
                        default="assembly_graph")
    parser.add_argument("--assembly-verbose", dest="assembly_verbose",
                        action="store_true")


def args_simulation(parser):
    parser.add_argument("--debug", dest="debug", type=str, default="",
                        help="e.g. basic,test_size:5,set_seed:101")
    parser.add_argument("--simulate-interval", dest="simulate_interval",
                        type=int, default=10)
    parser.add_argument("--read-len", dest="read_len", type=int, default=100)
    parser.add_argument("--fragment-len", dest="fragment_len", type=int,
                        default=350)
    parser.add_argument("--perbase-snprate", dest="perbase_snprate",
                        type=float, default=0.0,
                        help="%% chance per base of a germline SNP "
                             "injected into the simulated allele "
                             "(ref typing_common.py:726-745)")
    parser.add_argument("--skip-fragment-regions",
                        dest="skip_fragment_regions", type=str, default="",
                        help="comma-separated left-right backbone ranges "
                             "excluded from simulation "
                             "(ref args.py:311-316)")
    parser.add_argument("--random-seed", dest="random_seed", type=int,
                        default=None,
                        help="simulation seed (same as --debug set_seed:N)")
    parser.add_argument("--perbase-errorrate", dest="perbase_errorrate",
                        type=float, default=0.0)


def args_output(parser):
    parser.add_argument("--output-base", dest="output_base", type=str,
                        default="assembly_graph")
    parser.add_argument("--best-alleles", dest="best_alleles",
                        action="store_true")
    parser.add_argument("--output-allele-counts",
                        dest="output_allele_counts", action="store_true")


def parse_debug(debug_str):
    """Ref: hisatgenotype:371-393."""
    debug = {}
    if not debug_str:
        return debug
    for item in debug_str.split(","):
        if ":" in item:
            key, value = item.split(":", 1)
            debug[key] = value
        else:
            debug[item] = True
    return debug
