package graft

/** Regenerates `conf/schema_config.yaml` from the golden Scala registry
  * (SchemaRegistrySpec pins file ≡ code, so run this after editing
  * [[graft.core.SchemaRegistry]]): `sbt "runMain graft.GenSchemaYaml"`. */
object GenSchemaYaml {
  def main(args: Array[String]): Unit = {
    val out = java.nio.file.Paths.get(
      if (args.nonEmpty) args(0) else "conf/schema_config.yaml")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out,
      graft.core.SchemaYaml.render(
        graft.core.SchemaRegistry.nodes, graft.core.SchemaRegistry.edges)
        .getBytes("UTF-8"))
    println(s"wrote $out")
  }
}
