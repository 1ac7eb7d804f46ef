from .mesh import make_mesh
from .dp import DataParallelTrainer, StackedLoader, stack_batches
