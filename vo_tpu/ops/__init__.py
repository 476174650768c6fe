from vo_tpu.ops.image import (
    rgb_to_gray,
    gaussian_blur,
    sobel_gradients,
    box_filter,
    maxpool2d_same,
    avgpool2d,
    bilinear_sample,
)
