"""m06 image dup groups: the phash pair set clustered into canonical
duplicate groups — membership, labeling, and sizing must be exactly
the connected components of the m03 pair graph."""


def _components_of(pairs):
    """Reference union-find over the pair list (driver-side, test
    scale only)."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    groups = {}
    for node in list(parent):
        groups.setdefault(find(node), set()).add(node)
    return groups


def test_m06_groups_are_pair_components(spark, sf_dir):
    from common_crawl___autumn_2025_spark.operators.multimodal import (
        m03_phash_near_dup,
        m06_image_dup_groups,
    )

    pairs = [
        (r.img_a, r.img_b) for r in m03_phash_near_dup(spark, sf_dir).collect()
    ]
    assert pairs  # the synthetic records contain phash near-dups
    want = _components_of(pairs)
    got = {}
    sizes = {}
    for r in m06_image_dup_groups(spark, sf_dir).collect():
        got.setdefault(r.group_id, set()).add(r.image_id)
        sizes[r.group_id] = r.group_size
    # exactly the union-find components, labeled by their min member
    assert got == {min(m): m for m in want.values()}
    for gid, members in got.items():
        assert gid == min(members)
        assert sizes[gid] == len(members)
    # every paired image is grouped with its partner
    image_group = {img: gid for gid, ms in got.items() for img in ms}
    for a, b in pairs:
        assert image_group[a] == image_group[b]
