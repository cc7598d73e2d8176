from .genotype import type_reads, simulation_sweep
