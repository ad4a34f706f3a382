"""In-repo optional text kernels, loadable through the same ``plugin:``
contract as external packages (functions/tokenize.load_plugin_kernel) —
proof that the gate is a real extension point, not just a tested stub.
"""

from .cjk import cjk_bigram_tokenizer  # noqa: F401
