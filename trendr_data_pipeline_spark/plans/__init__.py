"""End-to-end query plans exposed through the driver contract.

Every module in this package registers queries with
:mod:`trendr_data_pipeline_spark.plans.registry`; importing the package
populates the registry. ``__spark_entry__`` (repo root) simply reads it.
"""

from __future__ import annotations

from . import registry  # noqa: F401


def load_all() -> None:
    """Import every query module (idempotent)."""
    from . import relational  # noqa: F401
    from . import analytics  # noqa: F401
    from . import text_ops  # noqa: F401
    from . import dedup_ops  # noqa: F401
    from . import similarity_ops  # noqa: F401
    from . import reference_ops  # noqa: F401
    from . import events_ops  # noqa: F401
    from . import scalar_ops  # noqa: F401
    from . import pipeline_ops  # noqa: F401
    from . import multimodal_ops  # noqa: F401
    from . import corpus_pipeline  # noqa: F401
    from . import release_ops  # noqa: F401
    from . import data_card  # noqa: F401
    from . import decontam_ops  # noqa: F401
    from . import pii_ops  # noqa: F401
    from . import layout_ops  # noqa: F401
    from . import spatial_ops  # noqa: F401
    from . import grid_ops  # noqa: F401
