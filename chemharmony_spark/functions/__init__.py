from chemharmony_spark.functions.chem import (  # noqa: F401
    inchi_to_smiles,
    smiles_to_inchi,
    with_derived_column_deduped,
)
from chemharmony_spark.functions.ids import (  # noqa: F401
    content_id,
    group_id,
    row_id,
    surrogate_aid,
)
from chemharmony_spark.functions.json_payload import (  # noqa: F401
    canonicalize_json_udf,
    json_get,
    to_data_payload,
)
