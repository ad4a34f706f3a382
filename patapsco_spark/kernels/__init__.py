"""In-repo optional text kernels, loadable through the same ``plugin:``
contract as external packages (functions/tokenize.load_plugin_kernel) —
proof that the gate is a real extension point, not just a tested stub.
"""

from .cjk import cjk_bigram_tokenizer  # noqa: F401
from .farsi import parsivar_lite_stemmer  # noqa: F401
from .lemma import lemma_lite_lemmatizer  # noqa: F401
from .moses import moses_lite_tokenizer  # noqa: F401
