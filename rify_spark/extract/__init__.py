from .canonicalize import canonicalize_quads, connected_components  # noqa: F401
from .code import assert_sha256, extract_triples, link_score_udf  # noqa: F401
from .synthetic import (  # noqa: F401
    code_files_df,
    code_files_df_distributed,
    code_files_rows,
    module_content,
    reference_sha256,
)
