from evplp_tpu.parallel.shard import (  # noqa: F401
    make_mesh, sharded_photon_fam_frame, sharded_pt_frame)
