"""Root data sources (the reference's ``IterDataset`` family,
``iter_dataset.py:33-539``, rebuilt as Ray Data readers)."""

from palimpzest_ray.sources.files import (
    infer_schema_from_file,
    read_csv_files,
    read_html_files,
    read_json_files,
    read_pdf_files,
    read_text_files,
    read_xls_files,
)

__all__ = [
    "read_text_files",
    "read_html_files",
    "read_csv_files",
    "read_json_files",
    "read_pdf_files",
    "read_xls_files",
    "infer_schema_from_file",
]
