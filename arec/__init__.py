"""arec — a TPU-native embedding/retrieval engine with the capabilities of
skywaLKer518/A-Recsys.

Rebuilt from scratch for TPU (JAX / XLA / Pallas / jit+shard_map), NOT a port
of the TF1 reference. Capability contract: SURVEY.md (blueprint of record;
the reference mount was empty — see SURVEY.md §0) and BASELINE.json:5.

Layering (bottom → top, mirrors SURVEY.md §1):
  arec.data      — dataset prep (ml1m, xing, synthetic) + Attributes schema
  arec.tables    — embedding-table engine: storage, lookup, mulhot pooling,
                   row-sharded all-to-all lookup
  arec.fusion    — attribute-to-embedding fusion (concat+MLP | sum)
  arec.models    — hybrid MF and LSTM/GRU sequence model families
  arec.losses    — sampled-softmax, full-softmax, warp/bpr + batch variants
  arec.kernels   — Pallas TPU kernels (lstm scan, topk MIPS, sampled logits)
  arec.dist      — mesh, PartitionSpecs, collective wrappers, multihost init
  arec.train     — jitted train step, eval loop, checkpointing, metrics
  arec.retrieval — sharded top-k MIPS serving path
"""

__version__ = "0.1.0"
