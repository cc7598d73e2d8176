"""Search for a (seed, interval, err) config where a punted read's
pileup contribution flips a representative-base/deletion-plausibility
threshold — forcing production phase 2 (the re-gate dispatch) — and
check dev == host there."""
import sys

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

from synth import make_gene_msa
from hgtpu.db import build_gene_ref
from hgtpu.pipeline import type_reads
from hgtpu.sim.simulator import simulate_reads
from hgtpu.typer.engine import TypingOptions
from hgtpu.utils.trace import TRACE

spec = make_gene_msa(seed=3, n_alleles=40)
ref, _ = build_gene_ref("A", spec["names"], spec["rows"],
                        spec["ref_allele"], min_var_freq=8.0)

from hgtpu.db.catalog import VT_DELETION, VT_INSERTION

d = ref.var_type == VT_DELETION
i = ref.var_type == VT_INSERTION
t_indel = next(n for a, n in enumerate(ref.allele_names)
               if ref.links[d, a].any() and ref.links[i, a].any())

hits = 0
for seed in (11, 12, 13, 14, 15):
    for interval in (8, 10, 12, 15, 20):
        for err in (0.03, 0.05):
            r1, r2, _ = simulate_reads(ref, [t_indel],
                                       simulate_interval=interval,
                                       read_len=100, frag_len=250,
                                       seed=seed, perbase_errorrate=err)
            R1 = [(r.name, r.seq) for r in r1]
            R2 = [(r.name, r.seq) for r in r2]
            TRACE.reset()
            dev = type_reads(ref, R1, R2,
                             TypingOptions(simulation=True,
                                           device_typing="on"))
            regate = TRACE.counters().get("rescue.regate", 0)
            host = type_reads(ref, R1, R2,
                              TypingOptions(simulation=True,
                                            device_typing="off"))
            same = (dev.cmpt == host.cmpt
                    and dev.exon_cmpt == host.exon_cmpt
                    and dev.num_reads == host.num_reads
                    and dev.num_pairs == host.num_pairs)
            tag = "REGATE" if regate else "      "
            ok = "ok" if same else "MISMATCH"
            print(f"seed={seed} int={interval} err={err} {tag} {ok} "
                  f"n={len(R1)}")
            if regate:
                hits += 1
            if regate and not same:
                print("  -> regate fired and results diverge!")
            if hits >= 3:
                print(f"[{hits} regate configs found]")
                sys.exit(0)
print(f"[{hits} regate configs found]")
