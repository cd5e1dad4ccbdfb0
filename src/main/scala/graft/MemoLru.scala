package graft

import scala.collection.concurrent.TrieMap

/** The (application, dir)-keyed memo discipline shared by the standing
  * offline builds (dd16 band index, dd18 decontamination ledger; the
  * mm07/st19 memos inline the same shape): one cached artifact per dir,
  * built at most once per application, with LRU-1 eviction — inserting
  * a new dir for the same application releases the previous dir's
  * artifact through `evict` (unpersist), atomically with the insert.
  * The coarse `synchronized` is deliberate (r16 ADVICE #1 rationale):
  * TrieMap.getOrElseUpdate may run the builder twice under concurrent
  * first access and leak the losing build's cached frame; builds are
  * driver-side and rare (one per dir), so lock cost is irrelevant.
  */
object MemoLru {
  def getOrBuild[V](cache: TrieMap[String, V], app: String, dir: String)(
      evict: V => Unit)(build: => V): V =
    cache.synchronized {
      cache.getOrElseUpdate(s"$app|$dir", {
        cache.keys.filter(_.startsWith(app + "|")).foreach { k =>
          cache.remove(k).foreach(evict)
        }
        build
      })
    }
}
