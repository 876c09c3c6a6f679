from sagnn_tpu.data.graph import IntervalGraphs, compile_interval_graphs
from sagnn_tpu.data.io import DatasetBundle, load_dataset, save_dataset
from sagnn_tpu.data.synthetic import synthetic_dataset, synthetic_edges
