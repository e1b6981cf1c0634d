from .batched_sw import BatchedGraphSW, GraphArrays

__all__ = ["BatchedGraphSW", "GraphArrays"]
