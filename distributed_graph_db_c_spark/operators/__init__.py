from .traversal import bfs, dfs_leaves, dfs_preorder, connected_components, degrees

__all__ = ["bfs", "dfs_leaves", "dfs_preorder", "connected_components", "degrees"]
