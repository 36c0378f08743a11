from .sharding import make_feature_mesh, lm_solve_sharded, shard_grid
