from vo_tpu.estimation.pnp import PnPConfig, PnPResult, pnp_ransac
