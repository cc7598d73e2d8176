"""hgtpu — a TPU-native genotyping framework.

A from-scratch re-design of the capabilities of HISAT-genotype
(reference: DaehwanKimLab/hisat-genotype v1.3.2) built on JAX/XLA/Pallas:

- ``hgtpu.db``       — graph-reference compiler (MSF -> backbone consensus,
                       variant tables, allele<->variant link matrix, haplotype
                       windows) and packed device artifacts.
                       [ref: hisatgenotype_typing_process.py:313-1255]
- ``hgtpu.align``    — TPU batch aligner (seed lookup + variant-aware
                       extension) replacing the HISAT2 C++ graph FM aligner.
                       [ref: hisat2 CLI invoked at typing_common.py:995-1036]
- ``hgtpu.typer``    — read->allele compatibility counting and the
                       SQUAREM-accelerated EM abundance solver.
                       [ref: typing_core.py:249-2171, typing_common.py:1282]
- ``hgtpu.assemble`` — guided de Bruijn assembly + Viterbi phasing.
                       [ref: hisatgenotype_assembly_graph.py]
- ``hgtpu.sim``      — read simulator with truth-encoded read names.
                       [ref: typing_common.py:696-982]
- ``hgtpu.parallel`` — jax.sharding mesh utilities; multi-chip typing step.
- ``hgtpu.pipeline`` — end-to-end genotyping orchestration.
- ``hgtpu.cli``      — reference-compatible command line front end.
"""

__version__ = "0.1.0"


def enable_compilation_cache(path=None):
    """Persist XLA compiles across processes (HGTPU_JAX_CACHE overrides
    the location; empty string disables).  Over the tunneled TPU a cold
    compile of the production class program costs minutes — the
    persistent cache turns every later process's compile into a disk
    load.  Called by the CLI, bench, and the production path."""
    import os

    want = os.environ.get("HGTPU_JAX_CACHE")
    if want == "":
        return
    path = want or path or os.path.join(
        os.path.expanduser("~"), ".cache", "hgtpu_xla")
    try:
        import jax

        if jax.config.jax_compilation_cache_dir:
            return
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # cache is an optimization, never a requirement
        pass
