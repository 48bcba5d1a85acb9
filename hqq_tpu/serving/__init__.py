# SPDX-License-Identifier: Apache-2.0
from .batching import ContinuousBatchingEngine, Request  # noqa: F401
from .generate import Generator, next_power_of_2, sample_token  # noqa: F401
from .paged import PagedBatchingEngine, PagedKVCache  # noqa: F401
from .speculative import (  # noqa: F401
    SpeculativeBatchingEngine,
    SpeculativeGenerator,
    SpeculativePagedEngine,
)
