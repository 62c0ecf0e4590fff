from .zoo import (
    MODEL_REGISTRY,
    register_model,
    get_model,
    line,
    example_line,
    polynomial,
    gaussian_peak,
    lorentzian_bg,
    lorder_mixed_bg,
    double_lorentzian_bg,
    exponential_decay,
    sinusoid,
)

__all__ = [
    "MODEL_REGISTRY",
    "register_model",
    "get_model",
    "line",
    "example_line",
    "polynomial",
    "gaussian_peak",
    "lorentzian_bg",
    "lorder_mixed_bg",
    "double_lorentzian_bg",
    "exponential_decay",
    "sinusoid",
]
