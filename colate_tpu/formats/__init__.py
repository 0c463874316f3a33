"""Readers/writers for the Relate/Colate file ecosystem.

Formats (grammar references into /root/reference):
- ``.mut``       semicolon-separated mutation table (src/mutations.cpp:57-257)
- ``.colate.in`` binary site stream (coal/coal.cpp:2503-2515)
- ``.coal``      epoch/rate output (coal/coal.cpp:3660-3846, coal_tree.cpp:265-293)
- ``.colate_mat``cached sufficient-statistic matrix (coal/coal.cpp:3437-3470)
- fasta          (gzipped) sequence / P-N masks (src/data.cpp:213-235)
- ``.anc``       marginal-tree lines (src/anc.cpp:6-47, mutations.cpp:342-397)
- poplabels      Relate sample annotation (src/sample.cpp:4-112)
"""

from colate_tpu.formats.mut import MutTable  # noqa: F401
from colate_tpu.formats.colate_in import read_colate_in, write_colate_in  # noqa: F401
from colate_tpu.formats.coal import CoalFile  # noqa: F401
from colate_tpu.formats.fasta import read_fasta  # noqa: F401
