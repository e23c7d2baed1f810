"""Collection runtime: jitted rollout engine + host collector."""

from tianshou_tpu.collect.collector import CollectState, CollectStats, Collector
from tianshou_tpu.collect.host_collector import HostCollector

__all__ = ["Collector", "CollectState", "CollectStats", "HostCollector"]
