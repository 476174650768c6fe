from vo_tpu.estimation.pnp import PnPConfig, PnPResult, pnp_ransac
from vo_tpu.estimation.procrustes import kabsch
from vo_tpu.estimation.essential import (
    EssentialConfig,
    EssentialResult,
    essential_ransac,
    relative_scale,
)
