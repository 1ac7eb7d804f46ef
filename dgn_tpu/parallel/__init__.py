from .mesh import make_mesh
from .dp import DataParallelTrainer, StackedLoader, stack_batches
from .halo import (EdgeParallelTrainer, PartitionedLoader, partition_batch)

__all__ = ["make_mesh", "DataParallelTrainer", "StackedLoader",
           "stack_batches", "EdgeParallelTrainer", "PartitionedLoader",
           "partition_batch"]
