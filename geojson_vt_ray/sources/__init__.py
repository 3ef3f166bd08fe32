from .docs import (doc_table_from_geojson, synthesize_corpus,  # noqa: F401
                   write_corpus, load_seed_geometries)
from .tabular import read_table as read_tabular  # noqa: F401
