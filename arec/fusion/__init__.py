from arec.fusion.fuse import init_fusion, apply_fusion
