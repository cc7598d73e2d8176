from .em import single_abundance
from .engine import type_gene, TypingOptions, GeneTypingResult
