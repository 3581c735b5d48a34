"""Model families: canonical PDE setups matching the reference gallery."""

from mfv2d_tpu.models import flow as flow
from mfv2d_tpu.models import poisson as poisson
from mfv2d_tpu.models import transport as transport
