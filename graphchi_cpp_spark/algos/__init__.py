"""Graph algorithm recipes (reference example_apps + toolkits/graph_analytics)."""
