from .genotype import type_reads, type_family, simulation_sweep
from .extract import ReadExtractor
