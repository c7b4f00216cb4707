from jellyfish_tpu.parallel.sharded import ShardedMerCounter, make_mesh

__all__ = ["ShardedMerCounter", "make_mesh"]
