from gstpu.parallel.mesh import make_mesh  # noqa: F401
from gstpu.parallel.sharded import (make_sharded_render,  # noqa: F401
                                    make_sharded_train_step)
