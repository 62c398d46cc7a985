from .blur import blur_pyramid, gaussian_blur, median_blur
from .canny import canny
from .color import enhance_brightness, enhance_contrast, grey_bgr_quirk, preprocess
from .sobel import sobel3

__all__ = [
    "blur_pyramid",
    "gaussian_blur",
    "median_blur",
    "canny",
    "enhance_brightness",
    "enhance_contrast",
    "grey_bgr_quirk",
    "preprocess",
    "sobel3",
]
