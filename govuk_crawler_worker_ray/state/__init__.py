"""Stateful components: the sharded URL-seen set (bloom + cuckoo +
exact store) replacing the reference's Redis TTL hash set, and robots
rules.  Shards are Ray actors; everything here is also usable without
Ray (plain objects) for unit tests and the pure-Python oracle.
"""
