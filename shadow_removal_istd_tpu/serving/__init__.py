"""Online serving (beyond the reference, whose only inference path is
the offline directory sweep, src/cgan.py:420-464): a bucketed jitted
stacked-inference engine and a micro-batching HTTP daemon."""

from shadow_removal_istd_tpu.serving.engine import (  # noqa: F401
    ArtifactEngine,
    InferenceEngine,
)
from shadow_removal_istd_tpu.serving.server import (  # noqa: F401
    MicroBatcher,
    OverloadedError,
    ServerStats,
    ShadowRemovalServer,
)
