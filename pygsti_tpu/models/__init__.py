"""Models: explicit/implicit op models, construction, gauge groups."""

from pygsti_tpu.models.model import Model, OpModel
from pygsti_tpu.models.explicitmodel import ExplicitOpModel
from pygsti_tpu.models.modelconstruction import (
    create_explicit_model, create_explicit_model_from_expressions,
    create_operation, create_spam_vector,
)
from pygsti_tpu.models import modelnoise
