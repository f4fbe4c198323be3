"""Silver transforms: the reference's 16 dim/fact pandas builders
re-expressed as lazy DataFrame chains (SURVEY.md §3.2)."""

from .builders import DIM_TRANSFORMS, FACT_TRANSFORMS

__all__ = ["DIM_TRANSFORMS", "FACT_TRANSFORMS"]
