"""Drug-design datasets (reference /root/reference/src/drug_design/)."""
from .pdbbind import (Affinity, Entry, find_root, load_entries,  # noqa: F401
                      load_entry, load_index)
