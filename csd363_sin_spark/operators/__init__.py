from csd363_sin_spark.operators.degree import (  # noqa: F401
    degree_stats,
    density,
    analyze_graph,
    avg_neighbor_degree,
    degree_assortativity,
)
from csd363_sin_spark.operators.structure import contract_graph  # noqa: F401
from csd363_sin_spark.operators.walks import random_walks  # noqa: F401
from csd363_sin_spark.operators.components import connected_components  # noqa: F401
from csd363_sin_spark.operators.bfs import (  # noqa: F401
    diameter_double_sweep,
    landmark_closeness,
    landmark_distances,
    select_landmarks,
    weighted_distances,
)
from csd363_sin_spark.operators.eigenvector import (  # noqa: F401
    eigenvector_centrality,
    katz_centrality,
)
from csd363_sin_spark.operators.ktruss import (  # noqa: F401
    k_truss_edges,
    truss_number,
)
from csd363_sin_spark.operators.triangles import (  # noqa: F401
    triangle_count,
    triangles_per_vertex,
    clustering_coefficient,
)
from csd363_sin_spark.operators.bridges import (  # noqa: F401
    bridge_decomposition,
    bridges,
    two_edge_components,
)
from csd363_sin_spark.operators.biconnectivity import (  # noqa: F401
    articulation_points,
    bcc_decomposition,
    biconnected_components,
    block_cut_tree,
)
from csd363_sin_spark.operators.nibble import (  # noqa: F401
    conductance_sweep,
    pagerank_nibble,
)
from csd363_sin_spark.operators.percolation import clique_percolation  # noqa: F401
from csd363_sin_spark.operators.lpa import (  # noqa: F401
    label_propagation,
    label_spreading,
)
