"""Multi-device scaling measurement of the sharded typing step.

Runs the placement correlation and compatibility counting sharded over
1/2/4/8 devices and reports throughput + scaling efficiency.  On real
hardware the dp axis rides ICI; on the CPU backend (virtual devices, set
XLA_FLAGS=--xla_force_host_platform_device_count=8) the numbers validate
program structure rather than interconnect bandwidth.

Usage: JAX_PLATFORMS=cpu python scripts/scaling_bench.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault(
    "XLA_FLAGS",
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import __graft_entry__ as ge
    from hgtpu.parallel.sharded import (device_tables, make_mesh,
                                        sharded_count, sharded_place)
    from hgtpu.typer.device_count import DeviceCounter

    n_dev_avail = len(jax.devices())
    gene = ge._tiny_gene(backbone_len=3072, n_vars=192, n_alleles=1024)
    dc = DeviceCounter(gene)
    rng = np.random.default_rng(0)
    results = {}
    REPS = 10
    for nd in (1, 2, 4, 8):
        if nd > n_dev_avail:
            break
        mesh = make_mesh(nd)
        place = sharded_place(mesh)
        count = sharded_count(mesh)
        n_reads = 512 * nd
        pwm_ext, reads = ge._synthetic_reads(n_reads=n_reads, read_len=128,
                                              backbone_len=3072)
        n_hts = 512 * nd
        hts = []
        for _ in range(n_hts):
            left = int(rng.integers(0, len(gene.backbone) - 150))
            vs = [int(v) for v in range(gene.n_vars)
                  if left <= gene.var_pos[v] <= left + 127][:8]
            hts.append((left, left + 127, vs))
        lefts, rights, vars_ = dc.pack_hts(hts)
        C, A = 64, gene.n_alleles
        class_mask = jnp.asarray(rng.random((C, A)) < 0.1)
        class_counts = jnp.asarray(
            rng.integers(1, 50, C).astype(np.float32))
        args_p = (jnp.asarray(pwm_ext), jnp.asarray(reads))
        args_c = (*device_tables(dc), jnp.asarray(lefts), jnp.asarray(rights),
                  jnp.asarray(vars_), class_mask, class_counts)
        jax.block_until_ready(place(*args_p))
        jax.block_until_ready(count(*args_c))
        t0 = time.time()
        for _ in range(REPS):
            out_p = place(*args_p)
            out_c = count(*args_c)
        jax.block_until_ready((out_p, out_c))
        dt = (time.time() - t0) / REPS
        results[nd] = dict(reads=n_reads, hts=n_hts, sec=dt,
                           reads_per_s=n_reads / dt)
    base = results[1]["reads_per_s"]
    for nd, r in results.items():
        r["scaling_efficiency"] = r["reads_per_s"] / (base * nd)
    out = {"results": results}
    if jax.default_backend() != "tpu":
        out["note"] = (
            "virtual CPU devices share host cores: weak-scaling efficiency "
            "is bounded by total host throughput and does NOT reflect ICI "
            "scaling; this run validates the sharded program structure. "
            "Run on a real pod slice for the >=85%-at-2-hosts target.")
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
