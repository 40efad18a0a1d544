package graft.api

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import graft.core._

/** S5: declarative persistence of a FeatureCollection as a JSON spec —
  * the Spark-idiomatic replacement for the reference's dill binary dump
  * (reference: tsflex/features/feature_collection.py:1264-1280). Functions
  * are stored by REGISTERED NAME and resolved against a registry at load
  * time (MLlib-style save/load), so specs are engine-version-portable and
  * human-readable; arbitrary closures are intentionally not serialized.
  */
object FeatureCollectionSerde {
  private val mapper = new ObjectMapper()

  private def winNode(w: Win): ObjectNode = {
    val n = mapper.createObjectNode()
    w match {
      case TimeWin(us)      => n.put("type", "time").put("us", us)
      case SeqWin(v, repr)  => n.put("type", "seq").put("v", v).put("repr", repr)
      case SampleWin(count) => n.put("type", "samples").put("n", count)
    }
    n
  }

  private def winFrom(n: JsonNode): Win = n.get("type").asText() match {
    case "time"    => TimeWin(n.get("us").asLong())
    case "seq"     => SeqWin(n.get("v").asDouble(), n.get("repr").asText())
    case "samples" => SampleWin(n.get("n").asLong())
    case t         => throw new IllegalArgumentException(s"unknown window type $t")
  }

  /** Serialize. Fails FAST on a function that is not resolvable by name in
    * `registry`/`naryRegistry` — emitting the spec anyway would produce a
    * file that can never reload (the reference serializes arbitrary lambdas
    * via dill, feature_collection.py:1264-1280; the Spark answer is a
    * registry, so the error channel must be at SAVE time, not load time).
    */
  def toJson(fc: FeatureCollection,
             registry: Map[String, FeatureFunc] = FeatureFuncs.byName,
             naryRegistry: Map[String, NaryFunc] = NaryFuncs.byName): String = {
    val root = mapper.createObjectNode()
    root.put("format", "graft-feature-collection")
    root.put("version", 1)
    val arr = root.putArray("descriptors")
    fc.descriptors.foreach { d =>
      val known = d match {
        case _: NaryFeatureDescriptor => naryRegistry.contains(d.funcName)
        case _                        => registry.contains(d.funcName)
      }
      require(known, s"function '${d.funcName}' is not in the serialization " +
        "registry — the spec could not reload; register it by name (pass a " +
        "registry to toJson/save and the same one to fromJson/load)")
      val n = arr.addObject()
      n.put("function", d.funcName)
      d match {
        case u: FeatureDescriptor => n.put("series", u.seriesName)
        case t: NaryFeatureDescriptor =>
          val sa = n.putArray("series")
          t.seriesNames.foreach(sa.add)
      }
      d.window.foreach(w => n.set[ObjectNode]("window", winNode(w)))
      d.strides.foreach { ss =>
        val sa = n.putArray("strides")
        ss.foreach(s => sa.add(winNode(s)))
      }
    }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  /** Rebuild from JSON; `registry` maps function names to implementations
    * (defaults to the built-in FeatureFuncs surface).
    */
  def fromJson(json: String,
               registry: Map[String, FeatureFunc] = FeatureFuncs.byName,
               naryRegistry: Map[String, NaryFunc] = NaryFuncs.byName): FeatureCollection = {
    val root = mapper.readTree(json)
    require(root.path("format").asText() == "graft-feature-collection",
      "not a graft feature-collection spec")
    val ds = root.get("descriptors") match {
      case arr: ArrayNode =>
        (0 until arr.size()).map { i =>
          val n = arr.get(i)
          val fname = n.get("function").asText()
          val window = Option(n.get("window")).map(winFrom)
          val strides = Option(n.get("strides")).map(sa =>
            (0 until sa.size()).map(j => winFrom(sa.get(j))))
          n.get("series") match {
            case sa: ArrayNode => // tuple-series (n-ary) descriptor
              val f = naryRegistry.getOrElse(fname, throw new IllegalArgumentException(
                s"n-ary function '$fname' not in registry — register it before loading"))
              NaryFeatureDescriptor(f,
                (0 until sa.size()).map(j => sa.get(j).asText()), window, strides)
            case sn =>
              val f = registry.getOrElse(fname, throw new IllegalArgumentException(
                s"function '$fname' not in registry — register it before loading"))
              FeatureDescriptor(f, sn.asText(), window, strides)
          }
        }
      case _ => throw new IllegalArgumentException("missing descriptors array")
    }
    new FeatureCollection(ds)
  }

  def save(fc: FeatureCollection, path: String,
           registry: Map[String, FeatureFunc] = FeatureFuncs.byName,
           naryRegistry: Map[String, NaryFunc] = NaryFuncs.byName): Unit =
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
      toJson(fc, registry, naryRegistry))

  def load(path: String,
           registry: Map[String, FeatureFunc] = FeatureFuncs.byName,
           naryRegistry: Map[String, NaryFunc] = NaryFuncs.byName): FeatureCollection =
    fromJson(java.nio.file.Files.readString(java.nio.file.Paths.get(path)),
      registry, naryRegistry)
}
