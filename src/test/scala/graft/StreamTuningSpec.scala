package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamTuning

/** The round-10 state-shard sizing rule: floor for small state, one
  * shard per KeysPerShard live rows, capped at the parallelism bound —
  * and at 100 TB cardinalities it turns the knob the other way (shards
  * far above core count), which is the claim the scaladoc makes.
  */
class StreamTuningSpec extends AnyFunSuite {

  test("shardsFor floors, scales with cardinality, and caps at the bound") {
    assert(StreamTuning.shardsFor(0L, 128) == StreamTuning.MinShards)
    assert(StreamTuning.shardsFor(1L, 128) == StreamTuning.MinShards)
    assert(StreamTuning.shardsFor(StreamTuning.KeysPerShard, 128) == StreamTuning.MinShards)
    assert(StreamTuning.shardsFor(8 * StreamTuning.KeysPerShard, 128) == 8)
    // partial shard rounds UP (ceil division)
    assert(StreamTuning.shardsFor(8 * StreamTuning.KeysPerShard + 1, 128) == 9)
    assert(StreamTuning.shardsFor(1L << 30, 128) == 128)
    // the 100 TB direction: a billion live keys wants ~15 k shards on a
    // big enough cluster, far above any single machine's core count
    assert(StreamTuning.shardsFor(1000000000L, 20000) == 15259)
  }
}
