from .sharded import make_mesh, sharded_typing_step
