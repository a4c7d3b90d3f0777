from arec.losses.sampling import log_uniform_sample, log_uniform_prob, uniform_sample
from arec.losses.losses import (
    sampled_softmax_loss, full_softmax_loss, warp_loss, bpr_loss,
    batch_mw_loss, batch_bpr_loss,
)
