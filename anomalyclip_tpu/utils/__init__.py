from anomalyclip_tpu.utils.logging import CSVMetricLogger, MetricLoggerSet, get_logger

__all__ = ["CSVMetricLogger", "MetricLoggerSet", "get_logger"]
