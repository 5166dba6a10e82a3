"""ChEMBL extraction queries + DB runner — parity with
fs_mol/preprocessing/utils/queries.py and db_utils.py (MySQL ChEMBL dump;
per-assay activity exports with protein classification metadata).

The connector (mysql-connector-python / pymysql) is an optional
dependency gated at call time; the SQL itself is expressed natively.
"""

from __future__ import annotations

import configparser
import logging
from typing import Iterator, List

logger = logging.getLogger(__name__)

# Per-assay activity export joined with protein target classification
# (queries.py CHEMBL_ASSAY_PROTEIN capability).
CHEMBL_ASSAY_PROTEIN = """
SELECT s.canonical_smiles AS canonical_smiles,
       act.pchembl_value AS pchembl_value,
       act.standard_value AS standard_value,
       act.standard_units AS standard_units,
       act.standard_relation AS standard_relation,
       act.standard_type AS standard_type,
       act.activity_comment AS activity_comment,
       a.chembl_id AS chembl_id,
       a.assay_type AS assay_type,
       a.confidence_score AS confidence_score,
       td.tid AS target_id,
       td.target_type AS target_type,
       protcls.protein_class_desc AS protein_class_desc,
       protcls.class_level AS protein_class_level
FROM assays a
JOIN activities act ON a.assay_id = act.assay_id
JOIN compound_structures s ON act.molregno = s.molregno
JOIN target_dictionary td ON td.tid = a.tid
JOIN target_components tc ON td.tid = tc.tid
JOIN component_class compcls ON tc.component_id = compcls.component_id
JOIN protein_classification protcls
     ON protcls.protein_class_id = compcls.protein_class_id
WHERE a.chembl_id = %s
"""

# Assay export without protein joins (EXTENDED_SINGLE_ASSAY_NOPROTEIN).
CHEMBL_ASSAY_NOPROTEIN = """
SELECT s.canonical_smiles AS canonical_smiles,
       act.standard_value AS standard_value,
       act.standard_units AS standard_units,
       act.standard_relation AS standard_relation,
       act.standard_type AS standard_type,
       a.chembl_id AS chembl_id,
       a.assay_type AS assay_type
FROM assays a
JOIN activities act ON a.assay_id = act.assay_id
JOIN compound_structures s ON act.molregno = s.molregno
WHERE a.chembl_id = %s
"""

# Candidate-assay discovery (initial_query.py): all assays above a
# measurement-count floor.
CHEMBL_CANDIDATE_ASSAYS = """
SELECT a.chembl_id AS chembl_id, COUNT(act.activity_id) AS num_activities
FROM assays a JOIN activities act ON a.assay_id = act.assay_id
GROUP BY a.chembl_id
HAVING num_activities >= %s
"""


def connect_from_config(config_path: str = "config.ini"):
    """MySQL connection from a config.ini [mysql] section (db_utils.py)."""
    cfg = configparser.ConfigParser()
    cfg.read(config_path)
    params = dict(cfg["mysql"]) if "mysql" in cfg else {}
    try:
        import mysql.connector  # type: ignore

        return mysql.connector.connect(**params)
    except ImportError:
        try:
            import pymysql  # type: ignore

            return pymysql.connect(**params)
        except ImportError as e:  # pragma: no cover
            raise ImportError(
                "A MySQL connector (mysql-connector-python or pymysql) is "
                "required for ChEMBL extraction; the rest of the pipeline "
                "operates on the exported CSVs."
            ) from e


def export_assay_csvs(
    connection,
    assay_ids: List[str],
    out_dir: str,
    with_protein: bool = True,
) -> Iterator[str]:
    """Run the per-assay query for each id and write one CSV per assay."""
    import os

    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)
    sql = CHEMBL_ASSAY_PROTEIN if with_protein else CHEMBL_ASSAY_NOPROTEIN
    for assay_id in assay_ids:
        df = pd.read_sql(sql, connection, params=(assay_id,))
        if len(df) == 0:
            logger.info("assay %s: no rows", assay_id)
            continue
        path = os.path.join(out_dir, f"{assay_id}.csv")
        df.to_csv(path, index=False)
        yield path
