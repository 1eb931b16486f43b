from .solutions import (  # noqa: F401
    AnalyticsTracker,
    BaseSolution,
    DistanceCalculation,
    Heatmap,
    ObjectCounter,
    QueueManager,
    RegionCounter,
    SpeedEstimator,
    TrackZone,
)
