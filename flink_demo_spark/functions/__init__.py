from .parity import FLINK_FUNCTION_MAP, flink_fn

__all__ = ["FLINK_FUNCTION_MAP", "flink_fn"]
