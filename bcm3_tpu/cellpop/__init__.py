from bcm3_tpu.cellpop.likelihood import CellPopulationLikelihood

__all__ = ["CellPopulationLikelihood"]
