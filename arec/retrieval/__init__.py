from arec.retrieval.mips import sharded_topk, topk_mips
