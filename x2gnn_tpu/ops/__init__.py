from x2gnn_tpu.ops.segment import (  # noqa: F401
    segment_sum,
    segment_mean,
    segment_max,
    segment_softmax,
)
from x2gnn_tpu.ops.basis import (  # noqa: F401
    poly_envelope,
    radial_basis,
    bessel_zeros_and_norms,
    spherical_bessel,
    legendre_cos_harmonics,
    sbf_2d,
)
