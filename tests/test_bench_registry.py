"""Every name in bench.py's OPS_DEFAULT sweep must resolve in the query
registry — a rename or dropped registration would otherwise only fail
at sweep time."""


def test_ops_default_subset_of_registry():
    import bench

    from pboh_entity_linking_ray.registry import all_queries

    qs = set(all_queries())
    missing = [n for n in bench.OPS_DEFAULT if n not in qs]
    assert not missing, f"bench OPS_DEFAULT names not registered: {missing}"
    assert len(set(bench.OPS_DEFAULT)) == len(bench.OPS_DEFAULT)
