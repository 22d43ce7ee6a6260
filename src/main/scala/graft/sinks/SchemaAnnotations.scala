package graft.sinks

import scala.annotation.StaticAnnotation

/** Field-level output-schema customization — the analogue of the
  * reference's BigQuery marshalling annotations
  * (java/.../bigqueryjobs/BigQueryDataField.java: name + mode override;
  * BigQueryIgnore.java; honored by impl/BigQueryFieldUtil.java:47-56).
  * Annotate case-class constructor params; `Outputs.annotatedSchema`
  * and `Outputs.toAnnotatedDF` read them via scala-reflect. */
final class OutputName(val name: String) extends StaticAnnotation

/** Override the derived mode: "REQUIRED" (non-nullable) or "NULLABLE". */
final class OutputMode(val mode: String) extends StaticAnnotation

/** Exclude the field from the derived schema and marshalled output. */
final class OutputIgnore extends StaticAnnotation
