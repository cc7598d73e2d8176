from .types import ReadAln
from .aligner import GeneAligner
