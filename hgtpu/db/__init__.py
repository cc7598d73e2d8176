from .catalog import GeneRef, Catalog, VT_SINGLE, VT_DELETION, VT_INSERTION
from .build import build_gene_ref, build_catalog_from_msa
from .msf import read_msf
