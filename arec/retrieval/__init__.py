from arec.retrieval.mips import (
    blocked_topk_mips, make_sharded_topk, sharded_topk, topk_mips,
)
