from .mesh import DataParallelRunner, make_mesh
