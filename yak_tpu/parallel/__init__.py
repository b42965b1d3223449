from yak_tpu.parallel.mesh import (make_mesh, MeshTable, build_count_step,
                                   count_file_mesh)
