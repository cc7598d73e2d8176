"""Build the deterministic synthetic test database used by the devel
integration runs (the stand-in for the IMGT-derived hla DB the reference
clones at runtime)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

from synth import make_gene_msa  # noqa: E402
from hgtpu.db import build_gene_ref, Catalog  # noqa: E402
from hgtpu.db.catalog import export_text  # noqa: E402


def main(out_dir):
    spec = make_gene_msa(seed=11, n_alleles=24, length=1800)
    ref, _ = build_gene_ref(
        "A", spec["names"], spec["rows"], spec["ref_allele"],
        exons_ref_coords=spec["exons"],
        primary_exon_idx=spec["primary_exon_idx"], min_var_freq=0.0)
    os.makedirs(out_dir, exist_ok=True)
    export_text(Catalog(family="hla", genes={"A": ref}),
                os.path.join(out_dir, "hla"))
    print("test db written to", out_dir)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         os.path.join(os.path.dirname(__file__), "testdb"))
